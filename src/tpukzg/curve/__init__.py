"""Curve layer: G1/G2 group arithmetic (SURVEY.md components 6-8)."""

from tpukzg.curve.g1 import G1  # noqa: F401
from tpukzg.curve.g2 import G2  # noqa: F401
