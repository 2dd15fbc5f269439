"""Transport-based span scoring: WMD / RWMD / WRD (placeholder wiring).

Full batched implementation lands in ops/wmd.py; this module exposes the
TransportEngine facade used by BruteForceIndex.
"""

from __future__ import annotations


class TransportEngine:
    def __init__(self, engine, alignment_args: dict):
        from vectorian_tpu.ops.wmd import WMDEngine

        self._impl = WMDEngine(engine, alignment_args)

    def find(self, index, query, sim):
        return self._impl.find(index, query, sim)
