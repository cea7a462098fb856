"""Background prefetch pipeline: gather + host->device transfer off the
critical path.

The reference relies on torch DataLoader workers
(``train_dataloader_num_workers``, reference ``base_trainer_config.py``);
the TPU-native equivalent is a producer thread that assembles the next
batches (using the native threaded gather) and issues ``device_put`` with
the data-parallel sharding while the current step runs, so the accelerator
never waits on the host.
"""

from __future__ import annotations

import queue
import threading

from ..parallel.mesh import shard_batch

# Grace period for the producer to exit on consumer shutdown before the
# thread is handed to the NEXT __iter__ to finish joining (see below).
_JOIN_TIMEOUT = 5.0


class PrefetchLoader:
    """Wrap a DataLoader with a device-put prefetching thread.

    Args:
        loader: the underlying DataLoader (yields host batches).
        mesh: the device mesh to shard onto.
        depth: number of batches to keep in flight.
    """

    def __init__(self, loader, mesh, depth: int = 2):
        self.loader = loader
        self.mesh = mesh
        self.depth = depth

    def set_epoch(self, epoch: int):
        self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        # A previous producer can outlive its 5 s grace join (blocked
        # inside self.loader's own iteration rather than in put()); wait
        # for it here so two producers never iterate the underlying
        # loader concurrently. The orphan is stashed on the UNDERLYING
        # loader (the trainer builds a fresh PrefetchLoader every
        # epoch, so an instance attribute would never be consulted
        # again).
        prev = getattr(self.loader, "_prefetch_producer_thread", None)
        if prev is not None and prev.is_alive():
            prev.join()
        self.loader._prefetch_producer_thread = None
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        sentinel = object()
        stop = threading.Event()
        error = []

        def put(item) -> bool:
            """Bounded put that gives up once the consumer is gone."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for batch in self.loader:
                    if not put(shard_batch(batch, self.mesh)):
                        return
            except BaseException as e:  # pragma: no cover
                error.append(e)
            finally:
                put(sentinel)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # Consumer may exit early (an evaluator raising mid-epoch):
            # signal the producer and drain so it never blocks forever
            # holding device batches.
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            thread.join(timeout=_JOIN_TIMEOUT)
            if thread.is_alive():
                self.loader._prefetch_producer_thread = thread
        if error:
            raise error[0]
