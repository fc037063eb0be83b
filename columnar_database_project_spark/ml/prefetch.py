"""Prefetcher + background PrefetchService.

Re-expresses reference prefetch.py:19-43 and prefetch_service.py:35-96
in Spark terms: "prefetch block" = load the block's DataFrame (block =
file), persist it, and insert into the BlockCache — a background no-op
action materializes it into the BlockManager. Prefetch jobs run in a
dedicated FAIR-scheduler pool so they never starve foreground queries
(the reference's daemon thread shares everything unsynchronized —
SURVEY §2.5.6).
"""

from __future__ import annotations

import threading
import time

from columnar_database_project_spark.ml.scheduler import PrefetchScheduler
from columnar_database_project_spark.sources.index import MicroBlockIndex
from columnar_database_project_spark.storage.access_logger import GlobalHistory
from columnar_database_project_spark.storage.block_cache import BlockCache

PREFETCH_POOL = "prefetch"


class Prefetcher:
    """Load predicted blocks into the cache (reference prefetch.py:19-43)."""

    def __init__(self, spark, index: MicroBlockIndex, cache: BlockCache):
        self.spark = spark
        self.index = index
        self.cache = cache

    def prefetch_block(self, block_id: int) -> bool:
        """False when already cached or unknown; True when loaded."""
        if self.cache.contains(block_id):
            return False
        try:
            path = self.index.block_file(block_id)
        except KeyError:
            return False
        sc = self.spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", PREFETCH_POOL)
        try:
            # block = file in either backend; the index tells us which
            # (ORC blocks come from MicroBlockIndex.build_from_scan)
            df = (
                self.spark.read.orc(path)
                if path.endswith(".orc")
                else self.spark.read.parquet(path)
            )
            self.cache.put(block_id, df)   # persists + materializes
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)
        return True

    def prefetch_many(self, block_ids: list[int]) -> int:
        return sum(1 for b in block_ids if self.prefetch_block(b))


class PrefetchService:
    """Driver daemon thread: every ``interval`` seconds, predict top-K
    next blocks from the global history and prefetch the misses
    (reference prefetch_service.py:35-96)."""

    def __init__(
        self,
        scheduler: PrefetchScheduler,
        prefetcher: Prefetcher,
        history: GlobalHistory,
        cache: BlockCache,
        interval: float = 60.0,
        history_len: int = 100,
        k: int = 10,
        min_prob: float = 0.0,
    ) -> None:
        self.scheduler = scheduler
        self.prefetcher = prefetcher
        self.history = history
        self.cache = cache
        self.interval = interval
        self.history_len = history_len
        self.k = k
        # Confidence floor (r8 prefetch economics): at 100 TB the
        # wasted speculative reads ARE the bill, so suggestions below
        # this sigmoid probability are dropped even inside the top-k.
        # 0.0 keeps the reference's pure-top-k behavior; the benched
        # operating point lives in BENCH prefetch_ab.min_prob_sweep.
        self.min_prob = min_prob
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.cycles = 0
        self.prefetched = 0
        self.suppressed = 0          # suggestions dropped by the floor
        self.issued_log: list[int] = []  # every block actually loaded

    def run_once(self) -> int:
        """One prediction+prefetch cycle; returns blocks prefetched."""
        seq = self.history.get_sequence(self.history_len)
        if not seq:
            return 0
        cached = set(self.cache.cached_ids())
        suggestions = self.scheduler.suggest_topk_prefetch(
            sequence=seq, k=self.k, exclude_blocks=cached
        )
        if not suggestions:
            return 0
        if self.min_prob > 0.0:
            kept = [(b, p) for b, p in suggestions if p >= self.min_prob]
            self.suppressed += len(suggestions) - len(kept)
            suggestions = kept
        loaded = [
            b for b, _p in suggestions if self.prefetcher.prefetch_block(b)
        ]
        self.issued_log.extend(loaded)
        self.prefetched += len(loaded)
        self.cycles += 1
        return len(loaded)

    def _loop(self) -> None:
        while not self._stop.wait(self.interval):
            try:
                self.run_once()
            except Exception:   # keep the daemon alive (parity with reference)
                pass

    def start(self) -> None:
        if self._thread and self._thread.is_alive():
            return
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="prefetch-service"
        )
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
