"""Beyond-parity LLM-data-pipeline queries (dedup, similarity, text).

Registered in build phase 5.
"""

from __future__ import annotations
