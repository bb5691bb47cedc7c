"""Threaded prefetching data loader.

Replaces the reference's multiprocess ``paddle.io.DataLoader`` workers
(reference ``trainer.py:108-111``). Audio decode releases the GIL inside
numpy/scipy, so a thread pool + bounded prefetch queue keeps the TPU fed
without process-spawn overhead; the heavy DSP all happens on device anyway
(see ``data_utils/reader.py``). A C++ decode path can slot in underneath
without changing this interface.
"""

import os
import queue
import threading

__all__ = ["DataLoader"]


class DataLoader:
    def __init__(self, dataset, batch_sampler, collate_fn, num_workers=4,
                 prefetch=4):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.collate_fn = collate_fn
        self.num_workers = max(1, int(num_workers))
        self.prefetch = prefetch
        # each worker may drive the C++ batch loader's own thread pool;
        # split the host cores across workers so concurrent batches do
        # not oversubscribe the CPU num_workers-fold
        self._native_threads = max(
            1, (os.cpu_count() or 1) // self.num_workers)

    def __len__(self):
        return len(self.batch_sampler)

    def __iter__(self):
        batches = list(self.batch_sampler)
        out_q = queue.Queue(maxsize=self.prefetch)
        results = {}
        results_lock = threading.Lock()
        next_emit = [0]
        job_q = queue.Queue()
        for i, b in enumerate(batches):
            job_q.put((i, b))
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    i, indices = job_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    # batch-level native fast path (GIL-free C++ thread
                    # pool) when the dataset provides one
                    items = (self.dataset.load_batch(
                                 indices, n_threads=self._native_threads)
                             if hasattr(self.dataset, "load_batch")
                             else None)
                    if items is None:
                        items = [self.dataset[j] for j in indices]
                    batch = self.collate_fn(items)
                except Exception as e:  # surface worker errors to consumer
                    batch = e
                # emit strictly in order so epochs are deterministic
                with results_lock:
                    results[i] = batch
                    while next_emit[0] in results:
                        out_q.put(results.pop(next_emit[0]))
                        next_emit[0] += 1

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for _ in range(len(batches)):
                item = out_q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
