import numpy as np

from vittf_tpu.utils.polygon import polygon_to_annotations, rasterize_polygon


def test_rasterize_square():
    poly = np.array([[2, 2], [2, 8], [8, 8], [8, 2]])
    mask = rasterize_polygon(poly, (12, 12))
    assert mask[5, 5] and not mask[0, 0] and not mask[10, 10]
    # area close to 36
    assert 30 <= mask.sum() <= 40


def test_polygon_to_annotations_contract():
    polys = {"bone": [np.array([[1, 1], [1, 5], [5, 5], [5, 1]])]}
    ann = polygon_to_annotations(polys, slice_index=7, axis=2, vol_shape=(10, 10, 16))
    coords = ann["bone"]
    assert coords.shape[1] == 3
    assert (coords[:, 2] == 7).all()
    assert coords[:, 0].max() <= 5 and coords[:, 1].max() <= 5
