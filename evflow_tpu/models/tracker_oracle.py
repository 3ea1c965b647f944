"""Pure-Python oracle for CornerTracker — faithful transliteration of
metavision_time_surface_periodic_group_track.cpp:163-537 for test parity.
Not a performance path.
"""

from __future__ import annotations

import math
from collections import deque
from typing import Dict, List, Tuple

from ..config import TrackerConfig


class _Track:
    __slots__ = ("x", "y", "label", "frame_count", "frames_since",
                 "hist", "velocity", "dir_cur", "group_id")

    def __init__(self, x, y, label):
        self.x = float(x)
        self.y = float(y)
        self.label = label
        self.frame_count = 0
        self.frames_since = 0
        self.hist: deque = deque()   # newest first
        self.velocity = (0.0, 0.0)
        self.dir_cur = (0.0, 0.0)
        self.group_id = -1


def _norm(v):
    return math.sqrt(v[0] * v[0] + v[1] * v[1])


class CornerTrackerOracle:
    def __init__(self, cfg: TrackerConfig = TrackerConfig()):
        self.cfg = cfg
        self.tracks: List[_Track] = []
        self.groups: Dict[int, dict] = {}
        self.next_label = 0

    # --- helpers mirroring the reference private methods
    def _push_history(self, tr: _Track):
        tr.hist.appendleft((tr.x, tr.y))
        if len(tr.hist) > self.cfg.history:
            tr.hist.pop()

    def _calc_direction(self, tr: _Track):
        if len(tr.hist) < 2:
            return (0.0, 0.0)
        wd = [0.0, 0.0]
        tw = 0.0
        for i in range(1, len(tr.hist)):
            dx = tr.hist[i - 1][0] - tr.hist[i][0]
            dy = tr.hist[i - 1][1] - tr.hist[i][1]
            mag = math.hypot(dx, dy)
            if mag > 0:
                w = self.cfg.weight_decay ** (i - 1)
                wd[0] += dx / mag * w
                wd[1] += dy / mag * w
                tw += w
        if tw > 0:
            wd = [wd[0] / tw, wd[1] / tw]
            m = _norm(wd)
            if m > 0:
                wd = [wd[0] / m, wd[1] / m]
        return tuple(wd)

    def _estimate_velocity(self, tr: _Track):
        if len(tr.hist) < 2:
            return (0.0, 0.0)
        sx = sy = 0.0
        cnt = 0
        for i in range(1, len(tr.hist)):
            sx += tr.hist[i - 1][0] - tr.hist[i][0]
            sy += tr.hist[i - 1][1] - tr.hist[i][1]
            cnt += 1
        avg = (sx / cnt, sy / cnt)
        speed = _norm(avg)
        if speed > 0:
            s = self.cfg.smoothing
            dv = (tr.dir_cur[0] * speed, tr.dir_cur[1] * speed)
            return (avg[0] * (1 - s) + dv[0] * s, avg[1] * (1 - s) + dv[1] * s)
        return avg

    def _predict(self, tr: _Track):
        px = tr.x + tr.velocity[0]
        py = tr.y + tr.velocity[1]
        if tr.frames_since > 0:
            conf = max(0.0, 1.0 - tr.frames_since / float(self.cfg.frames_to_skip))
            speed = _norm(tr.velocity)
            dpx = tr.x + tr.dir_cur[0] * speed
            dpy = tr.y + tr.dir_cur[1] * speed
            px = px * (1 - conf) + dpx * conf
            py = py * (1 - conf) + dpy * conf
        return (px, py)

    def update(self, detections: List[Tuple[float, float]]):
        cfg = self.cfg
        det_matched = [False] * len(detections)

        for tr in self.tracks:
            if tr.frames_since > cfg.frames_to_skip:
                continue
            pred = self._predict(tr)
            best, best_d = -1, cfg.max_distance
            for i, (dx, dy) in enumerate(detections):
                if det_matched[i]:
                    continue
                dist = math.hypot(pred[0] - dx, pred[1] - dy)
                if dist < best_d:
                    best_d = dist
                    best = i
            if best >= 0:
                tr.x, tr.y = detections[best]
                tr.frames_since = 0
                tr.frame_count += 1
                self._push_history(tr)
                nd = self._calc_direction(tr)
                dmp = cfg.damping
                tr.dir_cur = (tr.dir_cur[0] * dmp + nd[0] * (1 - dmp),
                              tr.dir_cur[1] * dmp + nd[1] * (1 - dmp))
                tr.velocity = self._estimate_velocity(tr)
                det_matched[best] = True
            else:
                pred = self._predict(tr)
                tr.x, tr.y = pred
                tr.frames_since += 1
                self._push_history(tr)
                tr.velocity = self._estimate_velocity(tr)

        for i, (dx, dy) in enumerate(detections):
            if not det_matched[i]:
                tr = _Track(dx, dy, self.next_label)
                self.next_label += 1
                tr.frame_count = 1
                self._push_history(tr)
                self.tracks.append(tr)

        self.tracks = [tr for tr in self.tracks
                       if not (tr.frames_since > cfg.frames_to_skip
                               or tr.frame_count > cfg.max_frames)]
        self._update_groups()

    def _update_groups(self):
        cfg = self.cfg
        self.groups = {}
        next_gid = 0
        processed = [False] * len(self.tracks)
        for i, ti in enumerate(self.tracks):
            if processed[i] or ti.frames_since > 0:
                continue
            members = []
            sp = [0.0, 0.0]
            sv = [0.0, 0.0]
            for j, tj in enumerate(self.tracks):
                if processed[j] or tj.frames_since > 0:
                    continue
                if math.hypot(ti.x - tj.x, ti.y - tj.y) <= cfg.group_radius:
                    processed[j] = True
                    tj.group_id = next_gid
                    members.append(tj.label)
                    sp[0] += tj.x; sp[1] += tj.y
                    sv[0] += tj.velocity[0]; sv[1] += tj.velocity[1]
            if members:
                cnt = len(members)
                cen = (sp[0] / cnt, sp[1] / cnt)
                avg = (sv[0] / cnt, sv[1] / cnt)
                rad = max(math.hypot(t.x - cen[0], t.y - cen[1])
                          for t in self.tracks if t.label in members)
                self.groups[next_gid] = dict(labels=members, centroid=cen,
                                             avg_velocity=avg, radius=rad)
                next_gid += 1
        for tr in self.tracks:
            if tr.frames_since == 0 and tr.group_id in self.groups:
                g = self.groups[tr.group_id]["avg_velocity"]
                b = self.cfg.group_blend
                tr.velocity = (tr.velocity[0] * (1 - b) + g[0] * b,
                               tr.velocity[1] * (1 - b) + g[1] * b)

    def live(self):
        """[(label, x, y, frames_since, frame_count, velocity, group_id)]"""
        return [(t.label, t.x, t.y, t.frames_since, t.frame_count,
                 t.velocity, t.group_id) for t in self.tracks]
