"""Pure vectorized kernels. No Ray imports here — everything operates on
numpy arrays / pyarrow arrays so stages can reuse them and unit tests can
run without a cluster."""
