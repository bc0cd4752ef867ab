"""Pallas TPU kernels for ops where XLA fusion is insufficient."""
