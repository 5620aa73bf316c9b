"""Dataset loader surface (GPy/util/datasets.py equivalents).

No network egress here, so parsing is exercised against fabricated cache
files in the exact upstream formats (tab matrices, .mat, tar.gz, PGM zips,
ASF/AMC), written into a tmp GPY_DATA_PATH.
"""
import os
import tarfile
import zipfile

import numpy as np
import pytest

from gpy_tpu.util import datasets


@pytest.fixture
def cache(tmp_path, monkeypatch):
    monkeypatch.setenv("GPY_DATA_PATH", str(tmp_path))
    return tmp_path


def _write(path, text):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text)


def test_registry_covers_reference_resources():
    # every resource name from the reference's data_resources.json
    expected = {
        "ankur_pose_data", "boston_housing", "boxjenkins_airline",
        "brendan_faces", "cifar-10", "cmu_mocap_full", "creep_rupture",
        "decampos_characters", "della_gatta", "drosophila_protein",
        "football_data", "fruitfly_tomancak", "hapmap3", "isomap_face_data",
        "lee_yeast_ChIP", "mauna_loa", "olivetti_faces", "olivetti_glasses",
        "olympic_marathon_men", "osu_run1", "osu_accad", "pumadyn-32nm",
        "ripley_prnn_data", "robot_wireless", "rogers_girolami_data",
        "singlecell", "singlecell_islam", "singlecell_deng", "sod1_mouse",
        "spellman_yeast", "swiss_roll", "three_phase_oil_flow", "xw_pen",
    }
    missing = expected - set(datasets.data_resources)
    assert not missing, f"registry missing: {missing}"


def test_loader_surface_complete():
    # every public loader the reference exposes (GPy/util/datasets.py `def`s)
    names = [
        "boston_housing", "brendan_faces", "della_gatta_TRP63_gene_expression",
        "football_data", "sod1_mouse", "spellman_yeast", "spellman_yeast_cdc15",
        "lee_yeast_ChIP", "fruitfly_tomancak", "drosophila_protein",
        "drosophila_knirps", "google_trends", "oil", "oil_100", "pumadyn",
        "robot_wireless", "silhouette", "decampos_digits", "ripley_synth",
        "global_average_temperature", "mauna_loa", "boxjenkins_airline",
        "osu_run1", "swiss_roll_generated", "hapmap3", "singlecell",
        "singlecell_rna_seq_islam", "singlecell_rna_seq_deng",
        "swiss_roll_1000", "swiss_roll", "isomap_faces", "simulation_BGPLVM",
        "toy_rbf_1d", "toy_rbf_1d_50", "toy_linear_1d_classification",
        "olivetti_glasses", "olivetti_faces", "xw_pen",
        "download_rogers_girolami_data", "olympic_100m_men",
        "olympic_100m_women", "olympic_200m_women", "olympic_200m_men",
        "olympic_400m_women", "olympic_400m_men", "olympic_marathon_men",
        "olympic_sprints", "crescent_data", "creep_data", "cifar10_patches",
        "cmu_mocap_49_balance", "cmu_mocap_35_walk_jog", "cmu_mocap",
        "cmu_urls_files", "sample_class", "data_available", "download_url",
        "authorize_download", "download_data", "data_details_return",
        "prompt_user",
    ]
    missing = [n for n in names if not callable(getattr(datasets, n, None))]
    assert not missing, f"loaders missing: {missing}"


def test_unavailable_raises_with_source(cache, monkeypatch):
    monkeypatch.setenv("GPY_TPU_DATA_AUTO", "1")  # authorize, then fail on net
    with pytest.raises(datasets.DatasetNotAvailable) as e:
        datasets.mauna_loa()
    assert "co2_mm_mlo.txt" in str(e.value) or "noaa" in str(e.value)


def test_boston_housing_parse(cache):
    arr = np.arange(28, dtype=float).reshape(2, 14)
    d = cache / "boston_housing"
    d.mkdir()
    np.savetxt(d / "housing.data", arr, fmt="%.1f")
    (d / "Index").write_text("")
    (d / "housing.names").write_text("")
    out = datasets.boston_housing()
    assert out["X"].shape == (2, 13) and out["Y"].shape == (2, 1)
    assert out["Y"][1, 0] == 27.0


def test_oil_parse_and_oil100(cache):
    d = cache / "three_phase_oil_flow"
    d.mkdir()
    rng = np.random.default_rng(0)
    for name, cols, n in [("DataTrn", 12, 1000), ("DataTst", 12, 5), ("DataVdn", 12, 5)]:
        np.savetxt(d / f"{name}.txt", rng.random((n, cols)), delimiter="\t")
        lbl = np.zeros((n, 3)); lbl[:, 0] = 1
        np.savetxt(d / f"{name}Lbls.txt", lbl, delimiter="\t")
    out = datasets.oil()
    assert out["X"].shape == (1000, 12)
    np.testing.assert_array_equal(np.unique(out["Y"]), [-1.0, 1.0])
    sub = datasets.oil_100()
    assert sub["X"].shape == (100, 12)


def test_mauna_loa_parse(cache):
    d = cache / "mauna_loa"
    d.mkdir()
    rows = []
    for i in range(10):
        # year month decdate average interpolated trend days
        avg = -99.99 if i == 3 else 330.0 + i
        rows.append(f"1990 {i+1} {1990 + i/12:.3f} {avg} {330.0 + i} 330.0 5")
    (d / "co2_mm_mlo.txt").write_text("\n".join(rows) + "\n")
    out = datasets.mauna_loa(num_train=5)
    assert out["X"].shape == (5, 1) and out["Xtest"].shape == (4, 1)  # one row dropped


def test_boxjenkins_parse(cache):
    d = cache / "boxjenkins_airline"
    d.mkdir()
    data = np.stack([np.arange(12, dtype=float), 100 + np.arange(12, dtype=float)], 1)
    np.savetxt(d / "boxjenkins_airline.csv", data, delimiter=",")
    out = datasets.boxjenkins_airline(num_train=8)
    assert out["X"].shape == (8, 1) and out["Ytest"].shape == (4, 1)


def test_ripley_parse(cache):
    d = cache / "ripley_prnn_data"
    d.mkdir()
    for f in datasets.data_resources["ripley_prnn_data"]["files"][0]:
        (d / f).write_text("xs ys yc\n")
    body = "\n".join(f"{i*0.1} {i*0.2} {i%2}" for i in range(20))
    (d / "synth.tr").write_text("xs ys yc\n" + body)
    (d / "synth.te").write_text("xs ys yc\n" + body)
    out = datasets.ripley_synth()
    assert out["X"].shape == (20, 2) and out["Y"].shape == (20, 1)


def test_olympics_mat_parse(cache):
    import scipy.io

    d = cache / "rogers_girolami_data"
    d.mkdir()
    inner = d / "firstcoursemldata"
    inner.mkdir()
    mat = {k: np.stack([1900 + 4.0 * np.arange(5), 10 + np.arange(5.0)], 1)
           for k in ["male100", "female100", "male200", "female200", "male400", "female400"]}
    scipy.io.savemat(inner / "olympics.mat", mat)
    with tarfile.open(d / "firstcoursemldata.tar.gz", "w:gz") as tar:
        tar.add(inner, arcname="firstcoursemldata")
    out = datasets.olympic_100m_men()
    assert out["X"].shape == (5, 1)
    spr = datasets.olympic_sprints()
    assert spr["X"].shape == (30, 2) and set(np.unique(spr["X"][:, 1])) == set(range(6))


def test_olivetti_faces_pgm_zip(cache):
    from gpy_tpu.util.netpbmfile import imsave

    d = cache / "olivetti_faces"
    d.mkdir()
    src = cache / "_src"
    rng = np.random.default_rng(0)
    for subj in range(1, 41):
        sd = src / f"s{subj}"
        sd.mkdir(parents=True)
        for img in range(1, 11):
            imsave(str(sd / f"{img}.pgm"), rng.integers(0, 255, (4, 3)).astype(np.uint8))
    with zipfile.ZipFile(d / "att_faces.zip", "w") as zf:
        for p in src.rglob("*.pgm"):
            zf.write(p, arcname=p.relative_to(src))
    out = datasets.olivetti_faces()
    assert out["Y"].shape == (400, 12)
    assert out["lbls"].min() == 1 and out["lbls"].max() == 40


def test_cmu_mocap_from_cache(cache):
    # reuse the tiny ASF/AMC from the mocap tests
    from test_mocap_netpbm import ASF, _amc
    d = cache / "cmu_mocap"
    d.mkdir()
    (d / "49.asf").write_text(ASF)
    frames = [(np.zeros(6), [10.0, 0, 0], [5.0, 1.0]) for _ in range(8)]
    (d / "49_18.amc").write_text(_amc(frames))
    (d / "49_19.amc").write_text(_amc(frames))
    (d / "49_20.amc").write_text(_amc(frames))
    out = datasets.cmu_mocap(49, [18, 19], [20], sample_every=2)
    assert out["Y"].shape[0] == 8  # 2 motions x 8 frames / every 2
    assert out["Ytest"].shape[0] == 4
    assert hasattr(out["skel"], "to_xyz")


def test_osu_run1_from_cache(cache):
    d = cache / "osu_run1"
    d.mkdir()
    header = "Frame Time A:x A:y A:z B:x B:y B:z junk"
    rows = [f"{i+1} {i*0.1} 1 2 3 4 5 6 0" for i in range(9)]
    take = cache / "Aug210106.txt"
    take.write_text(header + "\n" + "\n".join(rows) + "\n")
    with zipfile.ZipFile(d / "run1TXT.ZIP", "w") as zf:
        zf.write(take, arcname="Aug210106.txt")
    (d / "connections.txt").write_text("A, B\n")
    out = datasets.osu_run1(sample_every=2)
    assert out["Y"].shape[1] == 6  # 2 markers x 3 coords
    assert out["connect"].shape == (2, 2)


def test_synthetic_generators():
    assert datasets.toy_rbf_1d(num_samples=50)["X"].shape == (50, 1)
    assert datasets.toy_rbf_1d_50()["X"].shape == (50, 1)
    assert datasets.swiss_roll_generated(200)["Y"].shape == (200, 3)
    assert datasets.crescent_data(100)["X"].shape == (100, 2)
    s = datasets.sample_class(np.zeros((1000, 1)))
    assert set(np.unique(s)) == {-1.0, 1.0}
    assert datasets.olympic_marathon_men()["X"].shape[1] == 1  # synthetic fallback
