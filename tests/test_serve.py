"""serve.py: batch-serving CLI over a capture directory (headless)."""

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _make_captures(root: Path, sizes):
    rng = np.random.RandomState(0)
    for i, n in enumerate(sizes):
        stem = f"2026_01_01__12_00_{i:02d}_000000000"
        np.save(root / f"{stem}_data.npy", rng.rand(n, 3).astype(np.float32))


def test_serve_masks_and_confidences(tmp_path):
    import serve
    from recognizer3d_tpu.models.facade import Model
    from recognizer3d_tpu.models.settings import RandLANetSettings

    captures = tmp_path / "captures"
    captures.mkdir()
    # two size groups: three 4k clouds (batchable) + one 5k cloud
    _make_captures(captures, [4096, 4096, 4096, 5000])

    settings = RandLANetSettings(
        n_classes=2, n_points=256, n_features=0, n_neighbors=4,
        decimation=2, layer_sizes=[4, 8, 16, 32], knn="naive",
    )
    model_dir = tmp_path / "model"
    Model(settings, seed=0).save(model_dir)

    out = tmp_path / "out"
    rc = serve.main(
        ["-m", str(model_dir), "-d", str(captures), "-o", str(out),
         "--batch", "2"]
    )
    assert rc == 0
    masks = sorted(out.glob("*_prediction.npy"))
    assert len(masks) == 4
    for f in masks:
        stem = f.name[: -len("_prediction.npy")]
        cloud = np.load(captures / f"{stem}_data.npy")
        mask = np.load(f)
        assert mask.dtype == np.bool_ and mask.shape == (cloud.shape[0],)

    rc = serve.main(
        ["-m", str(model_dir), "-d", str(captures), "-o", str(out),
         "--batch", "4", "--confidences"]
    )
    assert rc == 0
    confs = sorted(out.glob("*_confidences.npy"))
    assert len(confs) == 4
    c = np.load(confs[0])
    assert c.shape[0] == 2  # (C, N)
    np.testing.assert_allclose(c.sum(axis=0), 1.0, atol=1e-3)


def test_dp_serving_matches_single_device():
    """DPServing over 4 virtual devices == single-device predict (the
    per-call permutation is drawn from global numpy RNG — pin it)."""
    from recognizer3d_tpu.models.facade import Model
    from recognizer3d_tpu.models.settings import RandLANetSettings
    from recognizer3d_tpu.parallel.serving import DPServing

    settings = RandLANetSettings(
        n_classes=2, n_points=256, n_features=0, n_neighbors=4,
        decimation=2, layer_sizes=[4, 8, 16, 32], knn="naive",
    )
    model = Model(settings, seed=0)
    serving = DPServing(model, n_devices=4)
    rng = np.random.RandomState(1)
    clouds = rng.rand(4, 4096, 3).astype(np.float32)

    np.random.seed(0)
    conf_single = model.predict(clouds)
    np.random.seed(0)
    conf_dp = serving.predict(clouds)
    np.testing.assert_allclose(conf_dp, conf_single, atol=1e-5)

    np.random.seed(0)
    mask_single = model.predict_mask(clouds, 0.5)
    np.random.seed(0)
    mask_dp = serving.predict_mask(clouds, 0.5)
    assert mask_dp.shape == mask_single.shape
    # masks threshold a continuous confidence: allow boundary-point flips
    assert (mask_dp != mask_single).mean() < 1e-3

    # ragged batch: B=3 over 4 devices pads internally, output stays B=3
    np.random.seed(0)
    conf3 = serving.predict(clouds[:3])
    assert conf3.shape == (3, 2, 4096)
    np.testing.assert_allclose(conf3, conf_dp[:3], atol=1e-5)


def test_serve_cli_devices_flag(tmp_path):
    import serve
    from recognizer3d_tpu.models.facade import Model
    from recognizer3d_tpu.models.settings import RandLANetSettings

    captures = tmp_path / "captures"
    captures.mkdir()
    _make_captures(captures, [4096, 4096, 4096])
    settings = RandLANetSettings(
        n_classes=2, n_points=256, n_features=0, n_neighbors=4,
        decimation=2, layer_sizes=[4, 8, 16, 32], knn="naive",
    )
    model_dir = tmp_path / "model"
    Model(settings, seed=0).save(model_dir)

    out = tmp_path / "out_dp"
    rc = serve.main(
        ["-m", str(model_dir), "-d", str(captures), "-o", str(out),
         "--batch", "2", "--devices", "2"]
    )
    assert rc == 0
    masks = sorted(out.glob("*_prediction.npy"))
    assert len(masks) == 3
    for f in masks:
        assert np.load(f).shape == (4096,)


def test_serve_cli_point_shards(tmp_path):
    """serve.py --point-shards: full-resolution point-sharded serving of
    non-divisible cloud sizes (VERDICT r2 #3)."""
    import serve
    from recognizer3d_tpu.models.facade import Model
    from recognizer3d_tpu.models.settings import RandLANetSettings

    captures = tmp_path / "captures"
    captures.mkdir()
    _make_captures(captures, [300, 300])  # 300 % 8 != 0

    settings = RandLANetSettings(
        n_classes=2, n_points=256, n_features=0, n_neighbors=4,
        decimation=2, layer_sizes=[4, 8, 16, 32], knn="naive",
    )
    model_dir = tmp_path / "model"
    Model(settings, seed=0).save(model_dir)

    out = tmp_path / "out"
    rc = serve.main(
        ["-m", str(model_dir), "-d", str(captures), "-o", str(out),
         "--point-shards", "8"]
    )
    assert rc == 0
    masks = sorted(out.glob("*_prediction.npy"))
    assert len(masks) == 2
    for f in masks:
        mask = np.load(f)
        assert mask.dtype == np.bool_ and mask.shape == (300,)


def test_serve_empty_dir(tmp_path, capsys):
    import serve
    from recognizer3d_tpu.models.facade import Model
    from recognizer3d_tpu.models.settings import RandLANetSettings

    settings = RandLANetSettings(
        n_classes=2, n_points=256, n_features=0, n_neighbors=4,
        decimation=2, layer_sizes=[4, 8, 16, 32], knn="naive",
    )
    model_dir = tmp_path / "model"
    Model(settings, seed=0).save(model_dir)
    empty = tmp_path / "empty"
    empty.mkdir()
    rc = serve.main(
        ["-m", str(model_dir), "-d", str(empty), "-o", str(tmp_path / "o")]
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip())["clouds"] == 0
