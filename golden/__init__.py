"""Golden model package: pure-Python BLS12-381 + KZG oracle (no JAX)."""
