"""Host process-parallel list map (reference ListMultiProcessor parity).

The reference used a Manager-list work queue drained by cpu_count processes
to parallelize its per-object dataset noising (reference:
src/benchmark/multiprocesser.py:6-79, used by Dataset.with_noise_mp).  Our
noiser is vectorized so it doesn't need this, but the utility itself remains
part of the public surface for host-side preprocessing of many independent
items (e.g. per-scene COLMAP exports).  Implementation uses a Pool with
spawn (fork deadlocks after jax backend initialization — see
benchmark/harness.py) and chunked dispatch rather than a polled Manager
list.
"""

from __future__ import annotations

import multiprocessing
from typing import Callable, List, Optional, Sequence, TypeVar

T = TypeVar("T")
R = TypeVar("R")


class ListMultiProcessor:
    """Process a list with a function across worker processes.

    API-compatible with the reference class (construct with the list and a
    picklable function, call ``process()``); progress printing is replaced
    by an optional callback.
    """

    def __init__(
        self,
        items: Sequence[T],
        func: Callable[[T], R],
        num_processes: Optional[int] = None,
        progress: Optional[Callable[[int, int], None]] = None,
    ):
        self.items = list(items)
        self.func = func
        self.num_processes = num_processes or multiprocessing.cpu_count()
        self.progress = progress

    def process(self) -> List[R]:
        if not self.items:
            return []
        if self.num_processes <= 1 or len(self.items) == 1:
            return [self.func(item) for item in self.items]
        ctx = multiprocessing.get_context("spawn")
        chunk = max(1, len(self.items) // (self.num_processes * 4))
        with ctx.Pool(self.num_processes) as pool:
            out = []
            for i, r in enumerate(pool.imap(self.func, self.items, chunksize=chunk)):
                out.append(r)
                if self.progress:
                    self.progress(i + 1, len(self.items))
            return out
