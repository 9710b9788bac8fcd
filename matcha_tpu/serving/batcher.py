"""Micro-batching request queue for serving.

The reference server processes requests strictly serially
(reference: matcha/server.py:93-127 — "synchronous single-request
inference").  On TPU, batched decodes are nearly free up to the HBM limit,
so this batcher is the serving-side throughput lever: requests that arrive
within ``max_wait_ms`` of each other (same solver/steps) are padded into one
bucketed TPU program call.
"""

from __future__ import annotations

import queue
import threading
import time as _time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field


@dataclass
class _Pending:
    ids: list[int]
    voice_mix: list[tuple[int, float]]
    length_scale: float
    n_timesteps: int
    solver: str
    future: Future = field(default_factory=Future)

    def group_key(self):
        return (self.n_timesteps, self.solver)


class RequestBatcher:
    def __init__(
        self,
        synthesizer,
        max_batch: int = 16,  # bench's measured RTF knee (performance.md)
        max_wait_ms: float = 15.0,
        fused: bool = False,
        pipeline: int = 1,
    ):
        self.synth = synthesizer
        self.fused = fused  # single-dispatch groups (see SERVE_FUSED)
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.q: queue.Queue[_Pending] = queue.Queue()
        # pipeline > 1: up to `pipeline` groups in flight at once, so group
        # k+1's device programs dispatch while group k's result streams back
        # D2H — overlapping transport with compute (jax dispatch is async
        # and jitted calls are thread-safe; the device serializes programs).
        # Worth it exactly when D2H/transport is a large share of group wall
        # time (measured 61 % through the dev tunnel, performance.md).
        # pipeline == 1 keeps today's strictly-serial behavior.
        self.pipeline = max(1, int(pipeline))
        self._pool = None
        self._inflight = None
        if self.pipeline > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self.pipeline, thread_name_prefix="batcher-run"
            )
            self._inflight = threading.BoundedSemaphore(self.pipeline)
        # watchdog: wall-clock of the currently-executing group (0 = idle).
        # A backend stuck inside a dispatch cannot be interrupted from
        # Python; what CAN be done is fail fast + flip /health so an
        # orchestrator restarts the pod (docker/ ships a HEALTHCHECK).
        # The threshold must exceed the worst legitimate inline compile of
        # an unwarmed shape (minutes on TPU) — warm the full ladder
        # (WARMUP_FULL=1 + WARMUP_BATCH_SIZES) to make 300 s conservative,
        # or tune via BATCHER_WEDGE_S.
        import os as _os

        # start time per in-flight group (keyed by a monotonic token; with
        # pipeline=1 it holds at most one entry — same semantics as before)
        self._active: dict[int, float] = {}
        self._active_lock = threading.Lock()
        self._run_token = 0
        self.wedge_threshold_s = float(_os.environ.get("BATCHER_WEDGE_S", "300"))
        # progressive warmup: while larger group programs are still
        # compiling, only groups ≤ cap are gathered so every dispatched
        # group hits an already-warmed executable (None = uncapped).  A
        # plain attribute: reads/writes are atomic under the GIL and the
        # gather loop re-reads it once per group.
        self._group_cap: int | None = None
        # requests whose (steps, solver) didn't match the group being
        # gathered; they seed the NEXT group (only touched by the loop thread)
        self._deferred: deque[_Pending] = deque()
        self._draining = threading.Event()
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(
        self,
        ids: list[int],
        speaker: int | None = None,
        length_scale: float = 1.0,
        n_timesteps: int = 4,
        solver: str = "midpoint",
        voice_mix: list[tuple[int, float]] | None = None,
    ) -> Future:
        if self._draining.is_set():
            raise RuntimeError("server draining; not accepting new requests")
        if self.wedged:
            raise RuntimeError(
                "synthesis backend wedged (a group has been executing "
                f"> {self.wedge_threshold_s:.0f}s); restart the server"
            )
        if voice_mix is None:
            voice_mix = [(int(speaker or 0), 1.0)]
        item = _Pending(ids, voice_mix, length_scale, n_timesteps, solver)
        self.q.put(item)
        return item.future

    def set_group_cap(self, n: int | None):
        """Cap gathered group size (progressive warmup); ``None`` removes
        the cap.  Raising the cap applies to the next gathered group."""
        self._group_cap = None if n is None else max(1, int(n))

    @property
    def wedged(self) -> bool:
        with self._active_lock:
            oldest = min(self._active.values(), default=0.0)
        return bool(oldest) and _time.monotonic() - oldest > self.wedge_threshold_s

    def shutdown(self):
        self._stop.set()
        self.thread.join(timeout=2)
        if self._pool is not None:
            self._pool.shutdown(wait=False)

    @property
    def idle(self) -> bool:
        """No queued, deferred, or executing work."""
        with self._active_lock:
            active = bool(self._active)
        return self.q.empty() and not self._deferred and not active

    def drain(self, timeout_s: float = 30.0) -> bool:
        """Graceful shutdown: refuse new submissions, let everything already
        accepted finish, then stop the gather loop.

        Returns True when the drain completed (all accepted futures
        resolved); False when ``timeout_s`` elapsed with work still in
        flight (a wedged backend) — the caller should exit anyway and let
        the orchestrator clean up.  The reference's uvicorn drains HTTP
        connections on SIGTERM but cuts queued synthesis work; here the
        queue is explicit, so the drain covers it.
        """
        self._draining.set()
        deadline = _time.monotonic() + max(0.0, timeout_s)
        while _time.monotonic() < deadline:
            if self.idle:
                break
            _time.sleep(0.05)
        done = self.idle
        self.shutdown()
        return done

    # ------------------------------------------------------------------

    def _loop(self):
        while not self._stop.is_set():
            if self._deferred:
                first = self._deferred.popleft()
            else:
                try:
                    first = self.q.get(timeout=0.1)
                except queue.Empty:
                    continue
            # register the group as active NOW, before gathering: `idle`
            # (drain) must never observe work that is out of the queue but
            # not yet in _active.  The wedge timer therefore also counts
            # gather (≤ max_wait) and pipeline backpressure — if in-flight
            # groups hold the semaphore past the threshold, the backend IS
            # wedged, so that is the correct signal.
            with self._active_lock:
                self._run_token += 1
                token = self._run_token
                self._active[token] = _time.monotonic()
            group = [first]
            key = first.group_key()
            deadline = _time.monotonic() + self.max_wait
            cap = (
                self.max_batch
                if self._group_cap is None
                else min(self.max_batch, self._group_cap)
            )
            while len(group) < cap:
                # drain compatible items parked by earlier gathers first
                match = next(
                    (i for i, it in enumerate(self._deferred) if it.group_key() == key),
                    None,
                )
                if match is not None:
                    item = self._deferred[match]
                    del self._deferred[match]
                    group.append(item)
                    continue
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self.q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt.group_key() == key:
                    group.append(nxt)
                else:
                    # incompatible: NEVER run inline (it would stall the
                    # gathered group past its deadline by a full synthesis) —
                    # park it to seed the next group
                    self._deferred.append(nxt)
            if self._pool is None:
                self._run(group, token)
            else:
                # bounded pipeline: block gathering only when `pipeline`
                # groups are already in flight (backpressure, not a queue).
                # Poll the semaphore so shutdown() can interrupt a loop
                # parked behind wedged in-flight groups; a group held at
                # shutdown must fail its futures, never strand them.
                acquired = False
                while not self._stop.is_set():
                    if self._inflight.acquire(timeout=0.1):
                        acquired = True
                        break
                if acquired:
                    try:
                        self._pool.submit(self._run_and_release, group, token)
                        continue
                    except RuntimeError as exc:  # pool already shut down
                        self._inflight.release()
                        self._fail_group(group, token, exc)
                        continue
                self._fail_group(
                    group, token,
                    RuntimeError("batcher shut down before dispatch"),
                )

    def _fail_group(self, group: list[_Pending], token: int, exc: Exception):
        with self._active_lock:
            self._active.pop(token, None)
        for g in group:
            if not g.future.done():
                g.future.set_exception(exc)

    def _run_and_release(self, group: list[_Pending], token: int):
        try:
            self._run(group, token)
        finally:
            self._inflight.release()

    def _run(self, group: list[_Pending], token: int):
        try:
            results = self.synth.synthesise_batch(
                [g.ids for g in group],
                n_timesteps=group[0].n_timesteps,
                solver=group[0].solver,
                length_scales=[g.length_scale for g in group],
                voice_mixes=[g.voice_mix for g in group],
                fused=self.fused,
            )
            for g, r in zip(group, results):
                g.future.set_result(r)
        except Exception as exc:  # pragma: no cover
            for g in group:
                if not g.future.done():
                    g.future.set_exception(exc)
        finally:
            with self._active_lock:
                self._active.pop(token, None)
