"""Model-stage parity queries (SES/Holt/ARIMA via applyInPandas).

Registered in build phase 4.
"""

from __future__ import annotations
