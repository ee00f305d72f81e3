"""Dataset on-disk format, broaden_annotation, splits, loader and camera."""

from datetime import datetime

import numpy as np
import pytest

from recognizer3d_tpu.camera.mock_camera import MockRealsenseCamera
from recognizer3d_tpu.data.dataset import (
    Dataset,
    DatasetMerged,
    broaden_annotation,
)
from recognizer3d_tpu.data.loader import get_data_loader


@pytest.fixture()
def small_dataset(tmp_path):
    ds = Dataset(tmp_path / "ds")
    rng = np.random.RandomState(0)
    t0 = datetime(2026, 1, 1, 10, 0, 0)
    stamps = []
    for i in range(5):
        ts = t0.replace(second=i)
        cloud = rng.randn(100 + i, 3).astype(np.float32)
        ds[ts] = cloud
        if i < 4:  # leave one unannotated
            ann = np.zeros(cloud.shape[0], dtype=np.uint8)
            ann[i] = 1
            ds.set_annotation(ts, ann)
        stamps.append(ts)
    return ds, stamps


class TestBroadenAnnotation:
    def test_ball_dilation(self):
        cloud = np.array(
            [[0, 0, 0], [0.005, 0, 0], [0.02, 0, 0], [1, 1, 1]],
            dtype=np.float32,
        )
        ann = np.array([1, 0, 0, 0], dtype=np.uint8)
        out = broaden_annotation(cloud, ann, radius=0.01)
        np.testing.assert_array_equal(out, [1, 1, 0, 0])

    def test_empty_annotation(self):
        cloud = np.random.randn(10, 3).astype(np.float32)
        out = broaden_annotation(cloud, np.zeros(10, dtype=np.uint8))
        assert out.sum() == 0

    def test_matches_reference_loop_semantics(self):
        rng = np.random.RandomState(0)
        cloud = rng.randn(500, 3).astype(np.float32) * 0.02
        ann = np.zeros(500, dtype=np.uint8)
        ann[rng.choice(500, 5, replace=False)] = 1
        out = broaden_annotation(cloud, ann, radius=0.01)
        # reference semantics: any point within radius of any annotated point
        expected = np.zeros(500, dtype=bool)
        for p in cloud[ann.astype(bool)]:
            expected |= np.linalg.norm(cloud - p, axis=1) < 0.01
        np.testing.assert_array_equal(out.astype(bool), expected)


class TestDataset:
    def test_len_counts_annotated(self, small_dataset):
        ds, _ = small_dataset
        assert len(ds) == 4
        ds_all = Dataset(ds._root_path, only_annotated=False)
        assert len(ds_all) == 5

    def test_getitem_by_index_skips_unannotated(self, small_dataset):
        ds, _ = small_dataset
        for i in range(4):
            xyz, feats, labels = ds[i]
            assert xyz.shape[1] == 3
            assert feats.shape == (xyz.shape[0], 0)
            assert labels.shape == (xyz.shape[0],)
            assert labels.sum() == 1

    def test_getitem_by_datetime(self, small_dataset):
        ds, stamps = small_dataset
        xyz, _, _ = ds[stamps[0]]
        assert xyz.shape == (100, 3)

    def test_timestamp_format(self):
        ts = Dataset.timestamp(datetime(2022, 9, 20, 8, 13, 58, 478586))
        assert ts == "2022_09_20__08_13_58_478586000"

    def test_split_deterministic(self, small_dataset):
        ds, _ = small_dataset
        a1, b1 = ds.split()
        a2, b2 = ds.split()
        assert a1._selection == a2._selection
        assert len(a1) + len(b1) == len(ds)

    def test_cache_sees_writes_from_other_instances(self, small_dataset):
        # the per-instance sample cache must revalidate against disk:
        # a write through a DIFFERENT Dataset object (or process) on the
        # same directory must be visible on the next read
        ds, stamps = small_dataset
        xyz_before, _, _ = ds[stamps[0]]  # populate the cache
        other = Dataset(ds._root_path)
        new_cloud = np.full((7, 3), 2.5, dtype=np.float32)
        other[stamps[0]] = new_cloud
        other.set_annotation(stamps[0], np.ones(7, dtype=np.uint8))
        xyz_after, _, ann_after = ds[stamps[0]]
        assert xyz_after.shape == (7, 3)
        np.testing.assert_array_equal(xyz_after, new_cloud)
        assert ann_after.sum() == 7

    def test_same_mtime_tick_addition_visible(self, small_dataset):
        # directory-mtime cache tokens can be too coarse: a sample added in
        # the same mtime tick as a preceding access must still be reachable
        # by index (the listing re-lists when an index falls out of range)
        ds, stamps = small_dataset
        ds_all = Dataset(ds._root_path, only_annotated=False)
        assert len(ds_all) == 5
        _ = ds_all[0]  # populate the listing cache
        # simulate a coarse-timestamp filesystem: freeze the dir mtime so
        # the cache token cannot observe the addition
        import os

        st = ds._root_path.stat()
        new_ts = datetime(2026, 1, 1, 10, 0, 59)
        ds_all[new_ts] = np.ones((7, 3), dtype=np.float32)
        os.utime(ds._root_path, ns=(st.st_atime_ns, st.st_mtime_ns))
        xyz, _, _ = ds_all[5]  # out of cached range -> forced re-list
        assert xyz.shape == (7, 3)

    def test_merged_indexing_and_split(self, small_dataset, tmp_path):
        ds, _ = small_dataset
        merged = DatasetMerged([ds, ds])
        assert len(merged) == 8
        xyz0, _, _ = merged[0]
        xyz4, _, _ = merged[4]
        np.testing.assert_array_equal(xyz0, xyz4)
        tr, va = merged.split()
        assert len(tr) == 6 and len(va) == 2


class TestLoader:
    def test_fixed_shape_batches(self, small_dataset):
        ds, _ = small_dataset
        loader = get_data_loader(ds, n_sample_points=64, batch_size=3)
        batches = list(loader)
        assert len(batches) == 2
        inputs, labels, idx = batches[0]
        assert inputs.shape == (3, 64, 3)
        assert labels.shape == (3, 64)
        assert inputs.dtype == np.float32 and labels.dtype == np.int32
        # remainder batch
        assert batches[1][0].shape == (1, 64, 3)

    def test_consistent_sampling_reproducible(self, small_dataset):
        ds, _ = small_dataset
        loader = get_data_loader(ds, 32, 4, consistent_sampling=True)
        a = next(iter(loader))[0]
        b = next(iter(loader))[0]
        np.testing.assert_array_equal(a, b)

    def test_raw_access_for_postprocess(self, small_dataset):
        ds, _ = small_dataset
        loader = get_data_loader(ds, 32, 1)
        inputs, labels, _ = loader.dataset.__getitem__(0, preprocess=False)
        assert inputs.shape[0] > 32  # full resolution


class TestMockCamera:
    def test_round_robin(self, small_dataset):
        ds, _ = small_dataset
        cam = MockRealsenseCamera("mock", ds)
        cam.start()
        clouds = [cam.get() for _ in range(5)]
        assert clouds[0].shape == clouds[4].shape  # wrapped around (len 4)
        np.testing.assert_array_equal(clouds[0], clouds[4])
        np.testing.assert_array_equal(cam.last_cloud, clouds[4])
        cam.stop()

    def test_empty_dataset_raises(self, tmp_path):
        with pytest.raises(Exception):
            MockRealsenseCamera("mock", Dataset(tmp_path / "empty"))
