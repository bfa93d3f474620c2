"""LLM-data-pipeline extension operators (north star, BASELINE.json).

Everything here is designed 100-TB-first: pure Column expressions or
bucketed joins; no driver-side loops, no all-pairs products except as
explicitly-labeled small-scale baselines.
"""
