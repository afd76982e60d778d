"""Live streaming runtime: async decode->dispatch pipeline + TCP transport.

The reference consumes a live sensor topic at 10 Hz in a synchronous
callback (ref cloudCallback, src/multiple_object_tracking_lidar.cpp:123-233).
`TrackerNode.on_pointcloud` mirrors that shape but synchronizes on every
frame's small outputs (one D2H per frame) — fine at 10 Hz, but it caps the
node at the host<->device round-trip latency.  This module adds the
production ingest path:

  * `StreamingNode` — decode and DISPATCH each frame immediately (JAX
    dispatch is asynchronous), keep a depth-k ring of in-flight frame
    outputs, and materialize results only when a slot is reused or on
    drain().  The device pipelines back-to-back steps while the host decodes
    the next frame; the per-frame D2H sync leaves the hot path.
  * `serve()` — a length-prefixed TCP endpoint (io/wire.py framing):
    PointCloud2 frames in, typed ObstacleArray/MarkerArray/pose records out
    (the reference's 2-subs/3-pubs surface, cpp:61-72, minus ROS).

A map must arrive before frames, exactly like the reference (cpp:128-131):
either pass a grid up front or send a `{"type": "map", ...}` message.
"""

from __future__ import annotations

import collections
import socket
import threading
import time
from typing import Callable

import jax
import numpy as np

from multiple_object_tracking_lidar_tpu.config import TrackerConfig
from multiple_object_tracking_lidar_tpu.io import wire
from multiple_object_tracking_lidar_tpu.io.pointcloud2 import PointCloud2, decode_pointcloud2
from multiple_object_tracking_lidar_tpu.ops.static_mask import MapEnv, build_static_mask
from multiple_object_tracking_lidar_tpu.outputs.messages import build_outputs
from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
from multiple_object_tracking_lidar_tpu.tracker.state import Frame
from multiple_object_tracking_lidar_tpu.utils.colors import GlibcRand
from multiple_object_tracking_lidar_tpu.utils.pgm import OccupancyGrid


class StreamingNode:
    """Async-dispatch tracking node: submit() returns as soon as the step is
    queued on the device; outputs surface through the callback ``depth``
    frames later (or at flush).  Bit-identical state chain to the sync node —
    only WHEN results are read back changes."""

    def __init__(
        self,
        config: TrackerConfig,
        on_outputs: Callable | None = None,
        depth: int = 2,
    ):
        self.config = config
        self.tracker = Tracker(config)
        self.state = self.tracker.init_state()
        self.on_outputs = on_outputs
        self.depth = max(1, int(depth))
        self.env: MapEnv | None = None
        self.time_init = time.time()
        self._first_frame = True
        self._rand = GlibcRand(config.color_seed)
        self.colors: dict[int, tuple[float, float, float, float]] = {}
        self._known_ids = 0
        self._pending: collections.deque = collections.deque()
        self.frames_in = 0
        self.frames_out = 0
        self.decode_ms: list[float] = []
        self.dispatch_ms: list[float] = []
        self.drain_ms: list[float] = []

    # -- map ingestion (cpp:235-251) -----------------------------------------
    def on_map(self, grid: OccupancyGrid) -> None:
        self.env = build_static_mask(
            grid, self.config.static_tolarance, self.config.occupied_threshold
        )
        self._bound_step = self.tracker.bind_env(self.env, donate_state=False)
        # prewarm: compile + one throwaway execution now, so the first live
        # frame is not a multi-second stall (the map gates frames anyway)
        n = self.config.caps.n_max_points
        dummy = Frame(
            points=np.zeros((n, 3), np.float32),
            mask=np.zeros(n, bool),
            t=np.float32(0.0),
        )
        _, out = self._bound_step(self.tracker.init_state(), dummy)
        jax.block_until_ready(out)

    # -- hot path ------------------------------------------------------------
    def submit(self, msg: PointCloud2) -> None:
        """Decode + dispatch; non-blocking on device completion."""
        if self.env is None:
            return
        stamp = msg.stamp
        if self._first_frame:
            # epoch fixups (cpp:132-139).  The sync TrackerNode re-applies
            # these until the first non-empty frame; here they run once —
            # equivalent for monotone stamp streams (both fixups are no-ops
            # on every later frame once applied), and the async ring cannot
            # know emptiness at submit time.
            if stamp < 1.0e9:
                self.time_init = 0.0
            if stamp - self.time_init < 0:
                self.time_init = stamp
            self._first_frame = False
        t = stamp - self.time_init

        t0 = time.perf_counter()
        pts, mask = decode_pointcloud2(msg, self.config.caps.n_max_points)
        t1 = time.perf_counter()
        frame = Frame(points=pts, mask=mask, t=np.float32(t))
        self.state, out = self._bound_step(self.state, frame)
        t2 = time.perf_counter()
        self.decode_ms.append(1e3 * (t1 - t0))
        self.dispatch_ms.append(1e3 * (t2 - t1))
        self.frames_in += 1
        # start the small-output D2H transfers NOW, in the background: the
        # drain then only awaits completion, so per-frame readback latency
        # (the dominant cost on tunneled/remote devices) overlaps across the
        # ring instead of serializing
        jax.tree.map(lambda a: a.copy_to_host_async(), out)
        self._pending.append((stamp, msg.frame_id, out))
        while len(self._pending) > self.depth:
            self._drain_one()

    def flush(self) -> None:
        while self._pending:
            self._drain_one()

    def _drain_one(self) -> None:
        stamp, frame_id, out = self._pending.popleft()
        t0 = time.perf_counter()
        out = jax.tree.map(np.asarray, out)  # blocks only until THIS frame done
        self.drain_ms.append(1e3 * (time.perf_counter() - t0))
        self.frames_out += 1
        if not bool(out.publish):
            return
        sel = [i for i in range(len(out.valid)) if out.valid[i]]
        ids = [int(out.obj_id[i]) for i in sel]
        if ids:
            self._refresh_colors(max(ids) + 1)
        obstacles, markers, pose = build_outputs(
            stamp=stamp,
            frame_id=frame_id,
            ids=ids,
            positions=out.pos[sel],
            velocities=out.vel[sel],
            colors=self.colors,
            obstacle_radius=self.config.obstacle_radius,
        )
        if self.on_outputs:
            self.on_outputs(obstacles, markers, pose)

    def _refresh_colors(self, n_ids: int) -> None:
        while self._known_ids < n_ids:
            r = np.float32(self._rand.rand()) / np.float32(2147483647)
            g = np.float32(self._rand.rand()) / np.float32(2147483647)
            b = np.float32(self._rand.rand()) / np.float32(2147483647)
            self.colors[self._known_ids] = (float(r), float(g), float(b), 0.8)
            self._known_ids += 1

    def summary(self) -> dict:
        def pct(xs, q):
            return round(float(np.percentile(xs, q)), 3) if xs else None

        return {
            "frames": self.frames_out,
            "decode_ms_p50": pct(self.decode_ms, 50),
            "dispatch_ms_p50": pct(self.dispatch_ms, 50),
            "dispatch_ms_p99": pct(self.dispatch_ms, 99),
            "drain_ms_p50": pct(self.drain_ms, 50),
            "drain_ms_p99": pct(self.drain_ms, 99),
        }


def serve(
    node: StreamingNode,
    host: str = "127.0.0.1",
    port: int = 18323,
    max_frames: int | None = None,
    ready: threading.Event | None = None,
) -> dict:
    """Serve one client connection: frames in, output records out.  Returns
    the node's latency summary when the client disconnects (or after
    ``max_frames``)."""
    srv = socket.create_server((host, port))
    try:
        if ready is not None:
            ready.set()
        conn, _ = srv.accept()
        with conn:
            rfile = conn.makefile("rb")
            wfile = conn.makefile("wb")
            wlock = threading.Lock()

            def on_outputs(obstacles, markers, pose):
                with wlock:
                    wire.write_record(wfile, obstacles)
                    wire.write_record(wfile, markers)
                    wire.write_record(wfile, pose)
                    wfile.flush()

            node.on_outputs = on_outputs
            n = 0
            while max_frames is None or n < max_frames:
                msg = wire.read_message(rfile)
                if msg is None:
                    break
                if isinstance(msg, PointCloud2):
                    node.submit(msg)
                    n += 1
                elif isinstance(msg, tuple) and msg[0] == "map":
                    d = msg[1]
                    from multiple_object_tracking_lidar_tpu.utils.pgm import MapInfo

                    grid = OccupancyGrid(
                        data=np.asarray(d["data"], dtype=np.int8),
                        info=MapInfo(**d["info"]),
                    )
                    node.on_map(grid)
            node.flush()
            summary = node.summary()
            with wlock:
                wire.write_json(wfile, "summary", summary)
                wfile.flush()
            return summary
    finally:
        srv.close()
