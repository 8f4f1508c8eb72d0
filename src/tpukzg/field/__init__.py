"""Field arithmetic layer: Fp/Fr Montgomery limb engine + extension tower."""

from tpukzg.field.mont import FieldParams, FP, FR  # noqa: F401
