import textwrap

from multiple_object_tracking_lidar_tpu.config import (
    TrackerConfig,
    config_from_mapping,
    load_config,
    load_launch_xml,
)


def test_defaults_match_reference():
    """Defaults mirror updateParam (ref cpp:86-115)."""
    c = TrackerConfig()
    assert c.frequency == 10.0
    assert c.cluster_tolerance == 0.15
    assert c.min_cluster_size == 5
    assert c.max_cluster_size == 200
    assert c.voxel_leaf_size == 0.05
    assert c.static_tolarance == 2
    assert c.id_threshold == 0.5
    assert c.lpf_tau == 0.01
    assert c.logSigma2_x == -5.5
    assert c.logMagnSigma2_x == -3.5
    assert c.logLengthScale_x == 0.75
    assert c.data_length == 10
    assert c.param_fix is True
    assert c.dt_gp == 0.1
    assert c.leaf_z == 1.0


def test_static_tolarance_clamped():
    assert TrackerConfig(static_tolarance=9).static_tolarance == 4
    assert TrackerConfig(static_tolarance=-3).static_tolarance == 0


def test_both_tolerance_spellings():
    c = config_from_mapping({"static_tolerance": 3})
    assert c.static_tolarance == 3
    # the (sic) key the reference reads wins when both present
    c = config_from_mapping({"static_tolarance": 1, "static_tolerance": 3})
    assert c.static_tolarance == 1


def test_launch_xml_with_reference_quirks(tmp_path):
    """Parses a launch file shaped like the reference's, including the
    malformed value=-'3.5' (launch:34)."""
    launch = tmp_path / "sim.launch"
    launch.write_text(
        textwrap.dedent(
            """\
            <?xml version="1.0"?>
            <launch>
              <node pkg='x' type='y' name='z'>
                <param name='frequency' value='10.0'/>
                <param name='max_cluster_size' value='300'/>
                <param name='voxel_leaf_size' value='0.1'/>
                <param name='static_tolerance' value='2'/>
                <param name='id_threshold' value='0.4'/>
                <!--param name='smooth_Sigma2' value='9.0'/-->
                <param name='logMagnSigma2_y' value=-'3.5'/>
                <param name='data_length' value='40'/>
                <param name='param_fix' value='true'/>
              </node>
            </launch>
            """
        )
    )
    c = load_launch_xml(str(launch))
    assert c.max_cluster_size == 300
    assert c.voxel_leaf_size == 0.1
    assert c.id_threshold == 0.4
    assert c.logMagnSigma2_y == -3.5  # malformed attr still reads as negative
    assert c.data_length == 40
    assert c.static_tolarance == 2
    # commented-out param not picked up
    assert not hasattr(c, "smooth_Sigma2")


def test_yaml_roundtrip(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text(
        "frequency: 20.0\n"
        "data_length: 20\n"
        "caps:\n"
        "  k_max_tracks: 32\n"
        "scene:\n"
        "  x_min: -10.0\n"
    )
    c = load_config(str(y))
    assert c.frequency == 20.0
    assert c.dt_gp == 0.05
    assert c.data_length == 20
    assert c.caps.k_max_tracks == 32
    assert c.scene.x_min == -10.0
