"""Stream slicing — the TPU-native EventBufferReslicerAlgorithm.

The reference chops the async callback stream into slices by event count
(make_n_events(16384), group_track.cpp:773) or by time window (make_n_us(50000),
accel …store.cpp:351), filling an int ring buffer of interleaved x,y
(aggregate_events_fct, accel …store.cpp:570-611). Here slicing is a pure
reshape of the recorded stream into fixed-shape (num_slices, N) arrays with a
per-slice valid count — the form every jitted stage consumes.

Note the reference's OpenCL path drops t and p on the device (only x,y are
interleaved into `data[16384]`; SURVEY §1 L1). We keep all four channels and
let each stage choose what it consumes.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from .events import EventStream


@dataclasses.dataclass
class EventSlices:
    """Fixed-shape sliced events.

    All arrays have shape (S, N). Events beyond `count[s]` in slice s are
    padding (masked; coordinates are clamped to 0 and count tracks validity).
    """

    x: np.ndarray      # int32 (S, N)
    y: np.ndarray      # int32 (S, N)
    t: np.ndarray      # int64 (S, N)
    p: np.ndarray      # int32 (S, N)
    count: np.ndarray  # int32 (S,) number of valid events per slice

    @property
    def num_slices(self) -> int:
        return int(self.x.shape[0])

    @property
    def slice_capacity(self) -> int:
        return int(self.x.shape[1])

    def valid_mask(self) -> np.ndarray:
        """(S, N) bool validity mask."""
        n = self.slice_capacity
        return np.arange(n)[None, :] < self.count[:, None]

    def slice_stream(self, s: int) -> EventStream:
        c = int(self.count[s])
        return EventStream(self.x[s, :c], self.y[s, :c], self.t[s, :c], self.p[s, :c])


def _pack(chunks: List[np.ndarray], capacity: int, dtype) -> np.ndarray:
    out = np.zeros((len(chunks), capacity), dtype=dtype)
    for i, ch in enumerate(chunks):
        c = min(len(ch), capacity)
        out[i, :c] = ch[:c]
    return out


def slice_by_count(stream: EventStream, n_events: int, drop_partial: bool = False) -> EventSlices:
    """make_n_events: consecutive windows of exactly n_events events.

    The final partial slice is kept (padded) unless drop_partial.
    """
    n = len(stream)
    num_full = n // n_events
    counts = [n_events] * num_full
    rem = n - num_full * n_events
    if rem and not drop_partial:
        counts.append(rem)
    if not counts:
        counts = [0]
    xs, ys, ts, ps = [], [], [], []
    off = 0
    for c in counts:
        xs.append(stream.x[off:off + c])
        ys.append(stream.y[off:off + c])
        ts.append(stream.t[off:off + c])
        ps.append(stream.p[off:off + c])
        off += c
    return EventSlices(
        x=_pack(xs, n_events, np.int32),
        y=_pack(ys, n_events, np.int32),
        t=_pack(ts, n_events, np.int64),
        p=_pack(ps, n_events, np.int32),
        count=np.array(counts, dtype=np.int32),
    )


def slice_by_time(stream: EventStream, n_us: int, capacity: int) -> EventSlices:
    """make_n_us: fixed time windows of n_us µs; each slice holds at most
    `capacity` events (overflow keeps the most recent `capacity`, matching the
    reference's ring-buffer wraparound which overwrites the oldest entries,
    accel …store.cpp:594-599)."""
    n = len(stream)
    if n == 0:
        z = np.zeros((1, capacity))
        return EventSlices(z.astype(np.int32), z.astype(np.int32),
                           z.astype(np.int64), z.astype(np.int32),
                           np.zeros(1, dtype=np.int32))
    t0 = int(stream.t[0])
    bins = ((stream.t - t0) // n_us).astype(np.int64)
    num_slices = int(bins[-1]) + 1
    xs, ys, ts, ps, counts = [], [], [], [], []
    edges = np.searchsorted(bins, np.arange(num_slices + 1))
    for s in range(num_slices):
        lo, hi = int(edges[s]), int(edges[s + 1])
        if hi - lo > capacity:  # ring-buffer overwrite: keep most recent
            lo = hi - capacity
        xs.append(stream.x[lo:hi])
        ys.append(stream.y[lo:hi])
        ts.append(stream.t[lo:hi])
        ps.append(stream.p[lo:hi])
        counts.append(hi - lo)
    return EventSlices(
        x=_pack(xs, capacity, np.int32),
        y=_pack(ys, capacity, np.int32),
        t=_pack(ts, capacity, np.int64),
        p=_pack(ps, capacity, np.int32),
        count=np.array(counts, dtype=np.int32),
    )


def decimate(stream: EventStream, keep_every: int) -> EventStream:
    """Counter-based decimation: keep 1 event in `keep_every`.

    Reference: 1/256 (async main:60), 1/512 (tracking store.cpp:558-566).
    """
    return stream[::keep_every]
