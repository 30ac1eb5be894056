"""Golden-data regression suites validating the JAX engine against
Fortran MAGICC7 reference outputs (CSVs under ``data/``)."""
