"""Worker for the two-process DCN fan-out test (test_dcn.py).

Each process owns 4 virtual CPU devices; jax.distributed stitches the two
processes into one 8-device global mesh, with the mesh laid out so the
``space`` axis PAIRS devices ACROSS the process boundary — every per-frame
voxel psum therefore rides the inter-process (DCN-analog) channel, proving
the deployment story beyond one host (SURVEY §5.h extension; the reference
is strictly single-process, cpp main()).

Run: python dcn_worker.py <process_id> <num_processes> <coordinator_port>
Prints "DCN_WORKER_OK" on success; any assertion failure exits non-zero.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert len(jax.local_devices()) == 4

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from multiple_object_tracking_lidar_tpu.config import Capacities, TrackerConfig
    from multiple_object_tracking_lidar_tpu.ops.static_mask import build_static_mask
    from multiple_object_tracking_lidar_tpu.parallel.sharding import ShardedTracker
    from multiple_object_tracking_lidar_tpu.tracker.pipeline import Tracker
    from multiple_object_tracking_lidar_tpu.tracker.state import Frame
    from multiple_object_tracking_lidar_tpu.utils.pgm import load_map_yaml

    cfg = TrackerConfig(
        voxel_leaf_size=0.1,
        data_length=6,
        caps=Capacities(
            n_max_points=512,
            m_max_voxels=256,
            m_max_dynamic=128,
            c_max_clusters=8,
            p_max_cluster=32,
            k_max_tracks=8,
        ),
    )
    tracker = Tracker(cfg)
    grid = load_map_yaml(
        os.path.join(os.path.dirname(__file__), "..", "assets", "sim_map.yaml")
    )
    env = build_static_mask(grid, cfg.static_tolarance, cfg.occupied_threshold)

    # mesh: 4 streams x 2-way point sharding, with each stream's space pair
    # = (process-0 device, process-1 device) -> the psum crosses processes
    devs = np.asarray(jax.devices()).reshape(nproc, 4).T  # (4, nproc)
    mesh = Mesh(devs, ("stream", "space"))
    st = ShardedTracker(tracker, mesh)

    b, n = 4, cfg.caps.n_max_points
    rng = np.random.default_rng(42)
    points = np.stack(
        [
            rng.uniform(-2.0, 2.0, (b, n)),
            rng.uniform(-1.0, 9.0, (b, n)),
            rng.uniform(0.0, 1.0, (b, n)),
        ],
        axis=2,
    ).astype(np.float32)
    mask = np.ones((b, n), bool)
    t = np.full(b, 0.1, np.float32)

    # stage global arrays from per-process local shards: this process holds
    # the (stream=all, space=pid) half of the point axis
    pts_shard = NamedSharding(mesh, P("stream", "space"))
    n_half = n // nproc
    pts_g = jax.make_array_from_process_local_data(
        pts_shard, points[:, pid * n_half : (pid + 1) * n_half]
    )
    mask_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("stream", "space")),
        mask[:, pid * n_half : (pid + 1) * n_half],
    )
    t_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("stream")), t
    )

    bstate = st.init_state(b)
    bstate, bout = st.step(bstate, pts_g, mask_g, t_g, env)

    from jax.experimental import multihost_utils

    bout_np = jax.tree.map(
        lambda x: np.asarray(multihost_utils.process_allgather(x, tiled=True)),
        bout,
    )

    # reference: per-stream single-device steps on THIS process (identical
    # inputs on both processes -> identical reference)
    for i in range(b):
        s = tracker.init_state()
        f = Frame(
            points=jnp.asarray(points[i]),
            mask=jnp.asarray(mask[i]),
            t=jnp.float32(0.1),
        )
        s, out = tracker.step(s, f, env)
        out = jax.tree.map(np.asarray, out)
        assert int(bout_np.n_clusters[i]) == int(out.n_clusters)
        assert int(bout_np.n_dynamic[i]) == int(out.n_dynamic)
        np.testing.assert_array_equal(bout_np.obj_id[i], out.obj_id)
        np.testing.assert_allclose(
            bout_np.raw_centroid[i], out.raw_centroid, atol=1e-5
        )

    print("DCN_WORKER_OK", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
