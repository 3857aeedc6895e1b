"""Traffic (clickstream) DWD/DWS pipelines — filled in as coverage widens."""

from __future__ import annotations
