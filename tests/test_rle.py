"""RLE annotation codec (reference old/train_semisparse_old.py:14 capability)."""
import numpy as np
import pytest

from vittf_tpu.core.rle import (
    decode_from_annotation,
    decode_rle_mask,
    encode_to_annotation,
)


def _random_labels(shape, n_classes, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, n_classes, shape).astype(np.int32)


def test_roundtrip_matches_argwhere():
    labels = _random_labels((9, 7, 11), 4)
    ann = encode_to_annotation(labels, label_names={1: "a", 2: "b", 3: "c"})
    coords = decode_from_annotation(ann, labels.shape)
    for c, name in [(1, "a"), (2, "b"), (3, "c")]:
        expect = np.argwhere(labels == c)
        np.testing.assert_array_equal(coords[name], expect)


def test_mask_roundtrip_exact():
    labels = _random_labels((16, 16, 16), 3, seed=1)
    ann = encode_to_annotation(labels)
    for c in (1, 2):
        mask = decode_rle_mask(ann[str(c)], labels.shape)
        np.testing.assert_array_equal(mask, labels == c)


def test_runs_at_volume_edges():
    labels = np.zeros((4, 4), np.int32)
    labels.reshape(-1)[0] = 1      # run starting at index 0
    labels.reshape(-1)[-3:] = 1    # run ending at the last voxel
    ann = encode_to_annotation(labels)
    runs = ann["1"].reshape(-1, 2)
    assert runs[0].tolist() == [0, 1]
    assert runs[-1].tolist() == [13, 3]
    np.testing.assert_array_equal(
        decode_rle_mask(ann["1"], labels.shape), labels == 1
    )


def test_background_excluded_by_default():
    labels = _random_labels((8, 8), 2)
    ann = encode_to_annotation(labels)
    assert "0" not in ann
    ann_bg = encode_to_annotation(labels, include_background=True)
    assert "0" in ann_bg


def test_out_of_range_run_raises():
    with pytest.raises(ValueError):
        decode_rle_mask(np.array([60, 10]), (8, 8))


def test_trainer_from_rle_annotations():
    from vittf_tpu.models.cnn3d import FeatureExtractorConfig
    from vittf_tpu.train.contrastive import ContrastiveConfig, ContrastiveTrainer

    rng = np.random.default_rng(0)
    vol = rng.random((12, 12, 12)).astype(np.float32)
    labels = np.zeros((12, 12, 12), np.int32)
    labels[2:6, 2:6, 2:6] = 1
    labels[7:11, 7:11, 7:11] = 2
    ann = encode_to_annotation(labels, label_names={1: "bone", 2: "lung"})

    cfg = ContrastiveConfig(
        model=FeatureExtractorConfig(1, (8,), (8,)), rec_field=3,
        batch_size=2, neg_count=8, schedule="const", iterations=4,
    )
    tr = ContrastiveTrainer.from_rle_annotations(vol, ann, cfg=cfg)
    # class indices reconstruct the annotated voxels exactly
    np.testing.assert_array_equal(tr.class_indices[1], np.argwhere(labels == 1))
    np.testing.assert_array_equal(tr.class_indices[2], np.argwhere(labels == 2))
    rec = tr.step()
    assert np.isfinite(rec["loss"])
