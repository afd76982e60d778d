import numpy as np

from multiple_object_tracking_lidar_tpu.outputs.messages import (
    _speed_text,
    build_outputs,
)


def test_speed_text_two_significant_digits():
    """ostringstream << setprecision(2) semantics (ref cpp:373-377)."""
    assert _speed_text(0.35, 0.0) == "0.35"
    assert _speed_text(1.234, 0.0) == "1.2"
    assert _speed_text(0.0, 0.0) == "0"
    assert _speed_text(0.05, 0.0) == "0.05"
    assert _speed_text(1.0, 1.0) == "1.4"   # sqrt(2) -> 1.41 -> "1.4"
    assert _speed_text(0.123, 0.0) == "0.12"


def test_build_outputs_fields():
    obstacles, markers, pose = build_outputs(
        stamp=12.5,
        frame_id="map",
        ids=[3, 7],
        positions=np.array([[1.0, 2.0], [3.0, 4.0]]),
        velocities=np.array([[0.5, 0.0], [0.0, -0.25]]),
        colors={3: (0.1, 0.5, 0.9, 0.8), 7: (0.2, 0.25, 0.3, 0.8)},
    )
    assert [o.id for o in obstacles.obstacles] == [3, 7]
    o = obstacles.obstacles[0]
    assert o.radius == 0.3                                # cpp:267
    assert o.position == (1.0, 2.0, 0.0)
    assert o.velocity == (0.5, 0.0, 0.0)
    assert o.covariance_diag == (0.1, 0.1, 1e9, 1e9, 1e9, 0.1)  # cpp:279-284
    # marker ids are 2*objID+1 (cpp:356)
    assert [m.id for m in markers.markers] == [7, 15]
    assert markers.markers[0].scale_z == 0.22
    assert markers.markers[0].color == (1.0, 1.0, 1.0, 1.0)
    # pose cloud intensity = 255*color.g (cpp:317)
    np.testing.assert_allclose(pose.intensity, [255 * 0.5, 255 * 0.25])
