from tpukzg.msm.pippenger import Pippenger, default_window

__all__ = ["Pippenger", "default_window"]
