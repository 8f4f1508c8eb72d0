from tpukzg.pallas.montmul import montmul_lm, make_montmul_pallas

__all__ = ["montmul_lm", "make_montmul_pallas"]
