"""ML surface (SURVEY §2.12, §7 M3): Arrow-vectorized batch inference
and MLlib estimator pipelines replacing the reference's torch
DataLoader loop + sklearn stacking head."""
