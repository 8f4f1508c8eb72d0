from tpukzg.utils.config import (FieldConfig, MsmConfig, NttConfig, KzgConfig,
                                 as_json_dict)
from tpukzg.utils.obs import get_logger, metric_record, trace, dump_jsonl

__all__ = ["FieldConfig", "MsmConfig", "NttConfig", "KzgConfig",
           "as_json_dict", "get_logger", "metric_record", "trace",
           "dump_jsonl"]
