"""Pairing layer (SURVEY.md components 13-15)."""

from tpukzg.pairing.check import pairing, pairing_check  # noqa: F401
from tpukzg.pairing.lines import precompute_lines  # noqa: F401
