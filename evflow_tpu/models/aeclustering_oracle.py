"""Pure-Python oracle for AEClustering — a faithful transliteration of the
reference semantics (AEClustering.cpp:47-206 + MyCluster.cpp), used only by the
test suite to validate the TPU engine. Deque-of-deques, per-event sequential;
NOT a performance path.

Covers the deployed default path (kappa=0: the sampling branch never matches,
MyCluster.cpp:83). Tracks persistent cluster ids like the accel copy
(accel/AEClustering.cpp:96-97).
"""

from __future__ import annotations

from collections import deque
from typing import List, Tuple

from ..config import ClusterConfig


class _Cluster:
    __slots__ = ("dat", "datT", "datPol", "mu", "alpha", "cid")

    def __init__(self, alpha: float, cid: int):
        self.dat: deque = deque()     # (x, y)
        self.datT: deque = deque()
        self.datPol: deque = deque()
        self.mu = [0.0, 0.0]
        self.alpha = alpha
        self.cid = cid

    @property
    def n(self) -> int:
        return len(self.dat)

    def add(self, x, y, t, pol):
        self.dat.append((x, y))
        self.datT.append(t)
        self.datPol.append(pol)
        if self.n == 1:
            self.mu = [float(x), float(y)]
        else:
            a = self.alpha
            self.mu = [(1 - a) * self.mu[0] + a * x, (1 - a) * self.mu[1] + a * y]

    def forget(self, tmin):
        while self.dat and self.datT[0] < tmin:
            self.dat.popleft()
            self.datT.popleft()
            self.datPol.popleft()

    def manhattan(self, x, y) -> float:
        return abs(x - self.mu[0]) + abs(y - self.mu[1])

    def centroid(self) -> Tuple[float, float]:
        if not self.dat:
            return (float("nan"), float("nan"))
        sx = sum(p[0] for p in self.dat)
        sy = sum(p[1] for p in self.dat)
        return (sx / self.n, sy / self.n)


class AEClusteringOracle:
    def __init__(self, cfg: ClusterConfig = ClusterConfig()):
        self.cfg = cfg
        self.clusters: List[_Cluster] = []
        self.tbuf: deque = deque()
        self.t0 = None
        self.tmin = 0
        self.next_cid = 0
        self.last_updated = -1

    def update(self, x, y, t_raw, pol=0):
        cfg = self.cfg
        if self.t0 is None:
            self.t0 = t_raw
        t = t_raw - self.t0

        self.tbuf.append(t)
        if len(self.tbuf) > cfg.sz_buffer:
            self.tbuf.popleft()
        self.tmin = self.tbuf[0]

        assigned, removed = [], []
        for ii, cl in enumerate(self.clusters):
            cl.forget(self.tmin)
            if cl.n == 0:
                removed.append(ii)
            elif cl.manhattan(x, y) <= cfg.radius:
                assigned.append(ii)
            elif cl.n > cfg.min_n and cfg.kappa > 0:
                # kappa>0 sampling path (deterministic full-min stand-in for
                # std::rand(); unused by the deployed apps)
                if cfg.kappa > cl.n:
                    md = min(abs(x - p[0]) + abs(y - p[1]) for p in cl.dat)
                    if md <= cfg.radius:
                        assigned.append(ii)
                else:
                    md = min(abs(x - p[0]) + abs(y - p[1]) for p in cl.dat)
                    if md <= cfg.radius:
                        assigned.append(ii)

        if not assigned:
            cl = _Cluster(cfg.alpha, self.next_cid)
            self.next_cid += 1
            cl.add(x, y, t, pol)
            self.clusters.append(cl)
            self.last_updated = len(self.clusters) - 1
        else:
            self.last_updated = assigned[0]
            self.clusters[assigned[0]].add(x, y, t, pol)
            if len(assigned) >= 2:
                self._merge(assigned)
                return  # reference early-returns, skipping empty removal

        for ii in reversed(removed):
            if self.last_updated > ii:
                self.last_updated -= 1
            del self.clusters[ii]

    def _merge(self, assigned: List[int]):
        target = self.clusters[assigned[0]]
        total_n = sum(self.clusters[i].n for i in assigned)
        mu = [0.0, 0.0]
        for i in assigned:
            c = self.clusters[i]
            wgt = c.n / total_n
            mu[0] += wgt * c.mu[0]
            mu[1] += wgt * c.mu[1]
        # k-way merge member lists by time (order immaterial for stats)
        items = []
        for i in assigned:
            c = self.clusters[i]
            items.extend(zip(c.datT, c.dat, c.datPol))
        items.sort(key=lambda it: it[0])
        target.dat = deque(it[1] for it in items)
        target.datT = deque(it[0] for it in items)
        target.datPol = deque(it[2] for it in items)
        target.mu = mu
        for i in reversed(assigned[1:]):
            del self.clusters[i]

    def live_stats(self):
        """[(cid, n, mu, centroid)] in deque order."""
        return [(c.cid, c.n, tuple(c.mu), c.centroid()) for c in self.clusters]
