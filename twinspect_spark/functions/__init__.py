"""Scalar/vectorized function library (SURVEY.md §2.9).

JVM-side column expressions live with their operators; this package holds
the numpy kernels used inside pandas/Arrow UDFs and their pure-Python
twins used by the test oracle.
"""
