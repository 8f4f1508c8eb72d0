from tpukzg.kzg.setup import Setup
from tpukzg.kzg.core import Kzg
from tpukzg.kzg.blob import BlobKzg

__all__ = ["Setup", "Kzg", "BlobKzg"]
