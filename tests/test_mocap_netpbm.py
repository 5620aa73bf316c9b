"""Mocap (ASF/AMC) and netpbm parsers — GPy/util/mocap.py and
GPy/util/netpbmfile.py equivalents.

Oracles (no golden CMU files offline): geometric invariants of forward
kinematics — zero angles reproduce the offset chain, bone lengths are
invariant under arbitrary joint angles, root rotation rotates the whole
pose rigidly — plus AMC/PNM round-trips.
"""
import io
import numpy as np
import pytest

from gpy_tpu.util import mocap, netpbmfile

ASF = """\
# test skeleton
:version 1.10
:name test
:units
  mass 1.0
  length 0.45
  angle deg
:documentation
  tiny two-bone arm
:root
  order TX TY TZ RX RY RZ
  axis XYZ
  position 0 0 0
  orientation 0 0 0
:bonedata
  begin
    id 1
    name upper
    direction 1 0 0
    length 2.0
    axis 0 0 30 XYZ
    dof rx ry rz
    limits (-180.0 180.0)
           (-180.0 180.0)
           (-180.0 180.0)
  end
  begin
    id 2
    name lower
    direction 0 1 0
    length 1.5
    axis 0 0 0 XYZ
    dof rx rz
    limits (-170.0 170.0)
           (-170.0 170.0)
  end
:hierarchy
  begin
    root upper
    upper lower
  end
"""


def _amc(frames):
    lines = ["#!OML:ASF", ":FULLY-SPECIFIED", ":DEGREES"]
    for i, (rootvals, uppervals, lowervals) in enumerate(frames):
        lines.append(str(i + 1))
        lines.append("root " + " ".join(map(str, rootvals)))
        lines.append("upper " + " ".join(map(str, uppervals)))
        lines.append("lower " + " ".join(map(str, lowervals)))
    return "\n".join(lines) + "\n"


@pytest.fixture
def skel(tmp_path):
    p = tmp_path / "test.asf"
    p.write_text(ASF)
    return mocap.AcclaimSkeleton(str(p))


def test_asf_parse_structure(skel):
    assert [v.name for v in skel.vertices] == ["root", "upper", "lower"]
    conn = skel.connection_matrix()
    assert conn[0, 1] and conn[1, 2] and not conn[0, 2]
    np.testing.assert_allclose(skel.vertices[1].meta["offset"], [2.0, 0, 0])
    assert skel.vertices[1].meta["order"] == "zyx"  # dof rx ry rz reversed
    assert skel.vertices[2].meta["order"] == "zx"
    assert skel.length == 0.45 and skel.angle == "deg"
    assert skel.vertices[1].meta["limits"].shape == (3, 2)


def test_fk_zero_angles_is_offset_chain(skel):
    channels = skel.parse_channels(_amc([(np.zeros(6), np.zeros(3), np.zeros(2))]))
    xyz = skel.to_xyz(channels[0])
    np.testing.assert_allclose(xyz[0], [0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(xyz[1], [2, 0, 0], atol=1e-12)
    np.testing.assert_allclose(xyz[2], [2, 1.5, 0], atol=1e-12)


def test_fk_bone_lengths_invariant(skel):
    rng = np.random.default_rng(0)
    for _ in range(5):
        vals = (rng.uniform(-40, 40, 6), rng.uniform(-40, 40, 3), rng.uniform(-40, 40, 2))
        channels = skel.parse_channels(_amc([vals]))
        xyz = skel.to_xyz(channels[0])
        assert np.linalg.norm(xyz[1] - xyz[0]) == pytest.approx(2.0, rel=1e-10)
        assert np.linalg.norm(xyz[2] - xyz[1]) == pytest.approx(1.5, rel=1e-10)


def test_fk_root_rotation_rotates_pose_rigidly(skel):
    base = skel.to_xyz(skel.parse_channels(
        _amc([(np.zeros(6), [10, 20, 30], [15, -25])]))[0])
    rot = skel.to_xyz(skel.parse_channels(
        _amc([([0, 0, 0, 0, 0, 90], [10, 20, 30], [15, -25])]))[0])
    # same pairwise distances (rigid motion)
    def pdist(x):
        return np.linalg.norm(x[:, None] - x[None], axis=-1)
    np.testing.assert_allclose(pdist(base), pdist(rot), atol=1e-10)
    assert not np.allclose(base, rot)  # but actually rotated


def test_amc_roundtrip(skel, tmp_path):
    rng = np.random.default_rng(1)
    frames = [(rng.uniform(-30, 30, 6), rng.uniform(-30, 30, 3), rng.uniform(-30, 30, 2))
              for _ in range(4)]
    channels = skel.parse_channels(_amc(frames))
    out = tmp_path / "rt.amc"
    skel.save_channels(str(out), channels)
    channels2 = skel.load_channels(str(out))
    np.testing.assert_allclose(channels, channels2, atol=1e-12)


def test_rotation_matrix_zxy_matches_closed_form():
    # closed form from the rotation-composition algebra (the reference
    # special-cases 'zxy'; the general loop must agree)
    import math
    xa, ya, za = 0.3, -0.7, 1.1
    c1, s1 = math.cos(xa), math.sin(xa)
    c2, s2 = math.cos(ya), math.sin(ya)
    c3, s3 = math.cos(za), math.sin(za)
    closed = np.array([
        [c2 * c3 - s1 * s2 * s3, c2 * s3 + s1 * s2 * c3, -s2 * c1],
        [-c1 * s3, c1 * c3, s1],
        [s2 * c3 + c2 * s1 * s3, s2 * s3 - c2 * s1 * c3, c2 * c1]])
    np.testing.assert_allclose(mocap.rotation_matrix(xa, ya, za, "zxy"), closed, atol=1e-12)


def test_smooth_angle_channels_unwraps(skel):
    channels = skel.parse_channels(_amc([
        (np.zeros(6), [170.0, 0, 0], [0, 0]),
        (np.zeros(6), [-175.0, 0, 0], [0, 0]),   # wrapped: really +185
        (np.zeros(6), [-160.0, 0, 0], [0, 0]),
    ]))
    col = skel.vertices[1].meta["rot_ind"][0]
    diffs = np.diff(channels[:, col])
    assert np.all(np.abs(diffs) < 180.0)


def test_osu_text_loader(tmp_path):
    header = "Frame Time A:x A:y A:z B:x B:y B:z junk"
    rows = ["1 0.0 1.0 2.0 3.0 4.0 5.0 6.0 0",
            "2 0.1 1.5 2.5 3.5 -9999.99 5.5 6.5 0"]
    (tmp_path / "toy.txt").write_text(header + "\n" + "\n".join(rows) + "\n")
    (tmp_path / "connections.txt").write_text("A, B\n")
    points, names, times = mocap.parse_text(str(tmp_path / "toy.txt"))
    assert list(names) == ["A:", "B:"] or list(names) == ["A", "B"]
    assert np.isnan(points[0][1, 1])  # B:x frame 2 was -9999.99
    Y, connect = mocap.load_text_data("toy", str(tmp_path), centre=False)
    # B had a NaN -> dropped; Y is (frames, 3 * 1 marker)
    assert Y.shape == (2, 3)
    assert connect.shape == (1, 1)


# --- netpbm -----------------------------------------------------------------

def test_pgm_p5_roundtrip(tmp_path):
    img = np.arange(30, dtype=np.uint8).reshape(5, 6)
    p = tmp_path / "a.pgm"
    netpbmfile.imsave(str(p), img)
    out = netpbmfile.imread(str(p))
    np.testing.assert_array_equal(out, img)


def test_ppm_p6_roundtrip_16bit(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 65535, size=(4, 3, 3)).astype(np.uint16)
    p = tmp_path / "a.ppm"
    netpbmfile.imsave(str(p), img, maxval=65535)
    out = netpbmfile.imread(str(p))
    np.testing.assert_array_equal(out, img)


def test_pam_p7_roundtrip(tmp_path):
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    p = tmp_path / "a.pam"
    netpbmfile.imsave(str(p), img, pam=True)
    out = netpbmfile.imread(str(p))
    np.testing.assert_array_equal(out, img)


def test_ascii_p2_with_comments():
    data = b"P2\n# a comment\n3 2\n# another\n255\n0 1 2\n3 4 5\n"
    out = netpbmfile.NetpbmFile(data).asarray()
    np.testing.assert_array_equal(out, [[0, 1, 2], [3, 4, 5]])


def test_ascii_p1_bitmap():
    data = b"P1\n# bitmap\n5 2\n01010\n1 1 0 0 1\n"
    out = netpbmfile.NetpbmFile(data).asarray()
    np.testing.assert_array_equal(out, [[0, 1, 0, 1, 0], [1, 1, 0, 0, 1]])


def test_binary_p4_bitmap():
    # 10 columns -> 2 bytes per row
    bits = np.array([[1, 0, 1, 0, 1, 0, 1, 0, 1, 1], [0] * 10], dtype=np.uint8)
    packed = np.packbits(bits, axis=1).tobytes()
    data = b"P4\n10 2\n" + packed
    out = netpbmfile.NetpbmFile(data).asarray()
    np.testing.assert_array_equal(out, bits)


def test_ascii_p3_color():
    data = b"P3 2 1 255  255 0 0  0 255 0\n"
    out = netpbmfile.NetpbmFile(data).asarray()
    np.testing.assert_array_equal(out, [[[255, 0, 0], [0, 255, 0]]])


def test_bad_magic_raises():
    with pytest.raises(ValueError):
        netpbmfile.NetpbmFile(b"Q5 1 1 255 x")
