"""Arrow-batched kernels (mapInPandas) — the only Python in the hot path.

Each kernel processes whole Arrow batches of documents; there are no
per-row Python UDFs anywhere in the engine (BASELINE.json input_hint:
"vectorized pandas/Arrow UDFs (no per-row Python) throughout").
"""
