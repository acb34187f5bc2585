"""Multi-host case dispatch — the DCN layer of the parallelism model.

The reference distributes work with Celery + Redis: one broker, one worker
per container, each case consumed by whichever worker is free
(platipy/backend/__init__.py:84-88, backend/tasks.py:176).  The TPU-native
equivalent keeps the same REST semantics (SURVEY §2.10): every TPU host runs
the service app (one JAX runtime, one or more chips), and this module is the
broker — it owns a case queue and dispatches each case to a healthy host via
the standard REST client, with health checks and automatic retry of failed
or orphaned cases on another host.

Within a host, parallelism is the ICI mesh (parallel/atlas.py,
parallel/spatial.py); across hosts there is no collective traffic — cases
are independent — so plain HTTP over DCN matches the communication pattern.
For the rarer single-program-multi-host regime (one giant volume sharded
over hosts), see ``initialize_multihost``.

Example (fleet of two TPU hosts)::

    pool = WorkerPool([
        Worker("tpu-host-a", 8000, api_key_a),
        Worker("tpu-host-b", 8000, api_key_b),
    ], algorithm="Cardiac Segmentation")
    results = pool.map([case1_path, case2_path, ...], working_dir="out/")
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence

logger = logging.getLogger(__name__)

__all__ = ["Worker", "WorkerPool", "CaseResult", "initialize_multihost"]


@dataclass
class Worker:
    """One service host (REST endpoint of a running backend app)."""

    host: str
    port: int
    api_key: str
    algorithm: Optional[str] = None
    healthy: bool = True
    cases_done: int = 0
    cases_failed: int = 0
    request_timeout: float = 30.0   # per-HTTP-request (hung hosts must fail)

    def client(self, algorithm: str):
        from platipy_tpu.client import PlatiPyClient

        return PlatiPyClient(self.host, self.port, self.api_key,
                             self.algorithm or algorithm,
                             timeout=self.request_timeout)

    def ping(self, algorithm: str, timeout: float = 5.0) -> bool:
        """Health check: the algorithm endpoint must answer within ``timeout``
        AND offer the requested algorithm (a live host deployed with a
        different algorithm set would otherwise burn a retry per case)."""
        from platipy_tpu.client import PlatiPyClient

        name = self.algorithm or algorithm
        try:
            client = PlatiPyClient(self.host, self.port, self.api_key, name,
                                   timeout=timeout)
            offered = {a.get("name") for a in client.list_algorithms()}
            self.healthy = name in offered
            if not self.healthy:
                logger.warning("Worker %s:%s does not offer %r (has %s)",
                               self.host, self.port, name, sorted(offered))
        except Exception as err:
            logger.warning("Worker %s:%s unhealthy: %s", self.host, self.port, err)
            self.healthy = False
        return self.healthy


@dataclass
class CaseResult:
    case: str
    worker: Optional[str] = None
    state: str = "PENDING"          # PENDING/RUNNING/COMPLETE/FAILURE
    outputs: List[str] = field(default_factory=list)
    error: Optional[str] = None
    attempts: int = 0
    elapsed_s: float = 0.0
    tried: set = field(default_factory=set)   # worker addresses attempted


class WorkerPool:
    """Dispatch independent cases over a fleet of service hosts.

    The scheduling model matches the reference's Celery semantics: a shared
    queue, workers pull when free, failed cases are retried on a different
    healthy worker up to ``max_attempts`` times (the reference relies on
    Celery's retry; here it is explicit and tested).
    """

    def __init__(self, workers: Sequence[Worker], algorithm: str,
                 settings: Optional[dict] = None, max_attempts: int = 2,
                 poll_interval: float = 0.5):
        if not workers:
            raise ValueError("WorkerPool needs at least one worker")
        self.workers = list(workers)
        self.algorithm = algorithm
        self.settings = settings
        self.max_attempts = max_attempts
        self.poll_interval = poll_interval

    def healthy_workers(self) -> List[Worker]:
        return [w for w in self.workers if w.ping(self.algorithm)]

    # -- single case ----------------------------------------------------------
    def _run_case(self, worker: Worker, case_path: str, output_dir: str,
                  result: CaseResult) -> bool:
        t0 = time.time()
        try:
            client = worker.client(self.algorithm)
            dataset = client.add_dataset()
            client.add_data_object(dataset, file_path=case_path)
            final = None
            for status in client.run_algorithm(
                dataset, config=self.settings, poll_interval=self.poll_interval
            ):
                final = status
            if not final or final.get("state") != "COMPLETE":
                result.error = (final or {}).get("error", "no terminal state")
                worker.cases_failed += 1
                return False
            # strip only known imaging suffixes — DICOM-UID-style names are
            # full of dots and name.split('.')[0] would collapse every
            # '1.2.840...' case into the same output directory
            stem = Path(case_path).name
            for suffix in (".gz", ".nii", ".nrrd", ".mha"):
                if stem.endswith(suffix):
                    stem = stem[: -len(suffix)]
            case_out = Path(output_dir) / stem
            files = client.download_output_objects(dataset,
                                                   output_path=str(case_out))
            result.outputs = [str(f) for f in files]
            result.elapsed_s = time.time() - t0
            worker.cases_done += 1
            return True
        except Exception as err:
            result.error = str(err)
            worker.cases_failed += 1
            worker.healthy = False   # re-probed on the next dispatch
            return False

    # -- fleet map -------------------------------------------------------------
    def map(self, case_paths: Sequence[str], working_dir: str = ".") -> Dict[str, CaseResult]:
        """Run every case on the fleet; returns {case_path: CaseResult}.

        One dispatcher thread per worker pulls from the shared queue — the
        queue IS the load balancer, so a slow host simply takes fewer cases
        (same behaviour as Celery's prefetch=1 worker, reference
        backend/__init__.py:84-88).
        """
        Path(working_dir).mkdir(parents=True, exist_ok=True)
        # results are keyed by case path, so a duplicate path would share one
        # CaseResult across two queue entries (double-counted attempts, the
        # same case running on two workers at once) — de-duplicate up front
        case_paths = list(dict.fromkeys(case_paths))
        results = {c: CaseResult(case=c) for c in case_paths}
        todo: "queue.Queue[str]" = queue.Queue()
        for c in case_paths:
            todo.put(c)
        # liveness keyed by worker INDEX — the same endpoint may be listed
        # twice for concurrency, so host:port is not an identity
        alive: Dict[int, bool] = {i: True for i in range(len(self.workers))}
        alive_lock = threading.Lock()

        def all_done() -> bool:
            return all(r.state in ("COMPLETE", "FAILURE")
                       for r in results.values())

        def worker_loop(index: int, worker: Worker):
            addr = f"{worker.host}:{worker.port}"
            ping_failures = 0
            try:
                # exit only when every case is terminal (a momentarily empty
                # queue may still receive a retry from another worker)
                while not all_done():
                    try:
                        case = todo.get(timeout=0.1)
                    except queue.Empty:
                        continue
                    result = results[case]
                    # a retry should land on a DIFFERENT worker: if this one
                    # already attempted the case and a so-far-untried worker
                    # is alive, hand it back (otherwise retry here rather
                    # than bounce it between exhausted workers forever)
                    with alive_lock:
                        untried_alive = any(
                            up for i, up in alive.items()
                            if up and i not in result.tried
                        )
                    if index in result.tried and untried_alive:
                        todo.put(case)
                        time.sleep(0.05)
                        continue
                    if not worker.ping(self.algorithm):
                        # transient blips recover on the next pull; a host
                        # that fails three consecutive probes retires
                        ping_failures += 1
                        todo.put(case)
                        if ping_failures >= 3:
                            logger.error(
                                "Worker %s retired after %d failed health "
                                "checks", addr, ping_failures)
                            return
                        time.sleep(1.0)
                        continue
                    ping_failures = 0
                    result.attempts += 1
                    result.tried.add(index)
                    result.worker = addr
                    result.state = "RUNNING"
                    ok = self._run_case(worker, case, working_dir, result)
                    if ok:
                        result.state = "COMPLETE"
                    else:
                        self._requeue_or_fail(todo, result, case)
            finally:
                with alive_lock:
                    alive[index] = False

        threads = [
            threading.Thread(target=worker_loop, args=(i, w), daemon=True)
            for i, w in enumerate(self.workers)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        # cases left non-terminal when every worker retired
        for result in results.values():
            if result.state not in ("COMPLETE", "FAILURE"):
                result.state = "FAILURE"
                result.error = result.error or "no healthy workers"
        return results

    def _requeue_or_fail(self, todo: "queue.Queue[str]", result: CaseResult,
                         case: str):
        if result.attempts < self.max_attempts:
            logger.warning("Case %s failed on %s (attempt %d), requeueing",
                           case, result.worker, result.attempts)
            result.state = "PENDING"
            todo.put(case)
        else:
            result.state = "FAILURE"
            logger.error("Case %s failed after %d attempts: %s",
                         case, result.attempts, result.error)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Join this host to a multi-host JAX runtime (DCN) and return the global
    device mesh axis sizes.

    Wraps ``jax.distributed.initialize`` — after it, ``jax.devices()`` spans
    every host and the atlas/spatial meshes (parallel/atlas.py,
    parallel/spatial.py) extend across DCN transparently; XLA routes
    cross-host collectives over DCN and intra-host ones over ICI.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
