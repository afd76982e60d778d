"""Single-chip multi-stream serving: host multiplexing at full throughput.

N independent LiDAR streams share ONE compiled step; each stream owns a
TrackerState pytree and dispatches round-robin (or on arrival).  Measured at
bench shapes this sustains the full kernel-path single-chip throughput
(~1795 aggregate clouds/s at B=4, docs/PERFORMANCE.md "Serving shape") —
unlike `parallel.sharding.ShardedTracker` on a 1x1 mesh, whose
shard_map+vmap program cannot lower the Pallas kernels (~300-420 aggregate).
ShardedTracker remains the MULTI-chip scale-out shape.

Warm-up: on this deployment stack each distinct state CHAIN compiles twice —
once for the fresh `init_state` buffer-layout signature and once for the
donated-output chain; a cold second-signature dispatch triggers a remote
compile that stalls the queue for seconds.  The constructor absorbs both
compiles per stream with empty-mask frames (semantically a no-op: no
detections -> no state change, ref cpp:146-150).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from multiple_object_tracking_lidar_tpu.ops.static_mask import MapEnv
from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
from multiple_object_tracking_lidar_tpu.tracker.state import Frame, FrameOutput, TrackerState


class MultiplexedTracker:
    """``step(stream_id, frame)`` over ``n_streams`` independent streams,
    one compiled program, full single-chip throughput."""

    def __init__(
        self,
        tracker: Tracker,
        env: MapEnv,
        n_streams: int,
        warm: bool = True,
        example_frame: Frame | None = None,
    ):
        if n_streams < 1:
            raise ValueError("n_streams must be >= 1")
        self.tracker = tracker
        self._step = tracker.bind_env(env, donate_state=True)
        self._states: list[TrackerState] = [
            tracker.init_state() for _ in range(n_streams)
        ]
        if warm:
            # the warm frames must match the SERVING frames' dtypes and
            # layouts — a different signature (e.g. a bool (N,) mask warmed
            # but a pre-staged f32 (N, 1) mask served, or pinned vs default
            # point layouts) recompiles per chain at first real dispatch,
            # stalling the queue for seconds each.  Pass `example_frame`
            # built exactly like production frames; the default matches the
            # node's decoder output (default-layout points, (N,) bool mask)
            if example_frame is None:
                n = tracker.config.caps.n_max_points
                example_frame = Frame(
                    points=jnp.zeros((n, 3), jnp.dtype(tracker.config.dtype)),
                    mask=jnp.zeros((n,), bool),
                    t=jnp.float32(0.0),
                )
            # warm with the example frame VERBATIM: even zeros_like on the
            # mask would drop a pinned custom layout and leave one cold
            # signature for the first real dispatch (measured: a single
            # ~8 s stall mid-serving).  Real data is fine — states are
            # re-initialized below, and compilation caches by signature,
            # not values
            for _ in range(2):  # fresh-init + donated-chain layout signatures
                for s in range(n_streams):
                    self._states[s], out = self._step(self._states[s], example_frame)
            np.asarray(out.publish)  # flip into streaming dispatch mode
            self._states = [tracker.init_state() for _ in range(n_streams)]

    @property
    def n_streams(self) -> int:
        return len(self._states)

    def step(self, stream_id: int, frame: Frame) -> FrameOutput:
        """Track one frame of one stream; other streams are untouched."""
        self._states[stream_id], out = self._step(self._states[stream_id], frame)
        return out

    def reset_stream(self, stream_id: int) -> None:
        """Forget a stream's tracks (e.g. sensor reconnect)."""
        self._states[stream_id] = self.tracker.init_state()

    def state(self, stream_id: int) -> TrackerState:
        return self._states[stream_id]
