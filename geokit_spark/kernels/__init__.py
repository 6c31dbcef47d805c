"""Pure-numpy kernels — the vectorized bodies of every pandas UDF.

No Spark imports here; unit-tested standalone against the reference's
public golden values (tile indices, clip areas, PIP edge conventions).
"""
