"""Speed-of-light bounds for the limb kernels (SURVEY.md component 30).

TPU peak numbers are parameterized per chip generation; the VPU bound is
what matters for u32 limb arithmetic (the MXU only engages once the int8
matmul montmul path lands).  %SoL = measured / bound.

Op-count model (per operation, 16-bit limbs, L limbs/element):

* montmul (separated REDC, field/mont.py):
    2.5 L^2 u32 multiplies (full product + low-half mu-mul + m*p)
  + ~5 L^2 cheap ALU ops (mask/shift/add column folds)
  + 3 carry sweeps of ~2L sequential steps
  We charge `montmul_vpu_ops = 8 * L^2` total VPU ops (mult counted 1).
* complete EC add (RCB15 a=0): 12 montmuls + 2 b3-mults + ~25 field
  add/sub (~2L ops each) -> ~14 montmuls equivalent.
* Pippenger MSM over n points, window c: ~2 * ceil(256/c) * n EC adds
  (segmented-scan bucket accumulation does ~2n combines per window).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float          # HBM bandwidth, GB/s
    vpu_u32_tops: float      # peak u32 ALU ops/s, in 10^12


# Public figures; VPU u32 estimated as lanes(8x128) * ~2 ALU ops/cycle * clock.
V5E = ChipSpec("v5e", hbm_gbps=819.0, vpu_u32_tops=1.9)
V5P = ChipSpec("v5p", hbm_gbps=2765.0, vpu_u32_tops=4.4)


def montmul_vpu_ops(L: int) -> float:
    return 8.0 * L * L


def ec_add_vpu_ops(L: int = 24) -> float:
    return 14.0 * montmul_vpu_ops(L)


def msm_ec_adds(n: int, c: int) -> float:
    windows = -(-256 // c)
    return 2.0 * windows * n + windows * (1 << c) * 2.0 + 256.0 * 2


def sol_montmul_per_s(chip: ChipSpec, L: int) -> float:
    return chip.vpu_u32_tops * 1e12 / montmul_vpu_ops(L)


def sol_ec_adds_per_s(chip: ChipSpec, L: int = 24) -> float:
    return chip.vpu_u32_tops * 1e12 / ec_add_vpu_ops(L)


def sol_msm_per_s(chip: ChipSpec, n: int, c: int) -> float:
    return sol_ec_adds_per_s(chip) / msm_ec_adds(n, c)


def hbm_bound_elems_per_s(chip: ChipSpec, bytes_per_elem: float) -> float:
    return chip.hbm_gbps * 1e9 / bytes_per_elem


def pct(measured: float, bound: float) -> float:
    return 100.0 * measured / bound if bound else 0.0
