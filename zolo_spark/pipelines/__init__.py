"""ETL pipelines (SURVEY §3.1): extract → lazy transform → load.

Each pipeline mirrors one reference job: driver-side paginated
extract (sources/), one lazy DataFrame lineage for the transform
(ops/), appends to the warehouse (S7/S8), then the watermark commit
(S10, at-least-once).
"""
