"""Inversion target-selection protocol parity (run.py:1874-1958).

Synthetic-split tests pinning which split supplies the optimization
target, the eval target, the eval render's bbox/center, and the
novel-view cameras for each dataset family/protocol.
"""

import numpy as np

from nerf_from_image_tpu.cli.inversion import select_inversion_targets
from nerf_from_image_tpu.data.loaders import DatasetSplit


def _split(tag, n=6, with_bbox=False, with_center=False, res=8):
    rng = np.random.RandomState(hash(tag) % 2**31)
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = rng.uniform(-1, 1, n)
    s = DatasetSplit(
        images=np.full((n, res, res, 4), ord(tag[0]) % 7 - 3.0, np.float32),
        tform_cam2world=poses,
        focal_length=np.full((n,), 1.0 + ord(tag[0]) % 5, np.float32))
    if with_bbox:
        s.bbox = rng.uniform(0, 1, (n, 2, 2)).astype(np.float32)
    if with_center:
        s.center = rng.uniform(0.4, 0.6, (n, 2)).astype(np.float32)
    return s


SEL = np.asarray([1, 3])
PERM = np.asarray([2, 0])


def test_trainsplit_protocol_imagenet():
    """imagenet/p3d train-split: optimize on UNCROPPED train images,
    evaluate with train_eval bbox against cropped train_eval images."""
    train = _split('t')           # uncropped (bbox None, reference
    train_eval = _split('e', with_bbox=True)  # loaders.py:383-385)
    cfg = {'views_per_object': 1, 'views_per_object_test': 0,
           'camera_projection_model': 'perspective'}
    out = select_inversion_targets('imagenet_car', cfg, False, False,
                                   train, train_eval, train_eval, SEL, PERM)
    np.testing.assert_array_equal(out['target_img'], train.images[SEL])
    np.testing.assert_array_equal(out['target_img_fid'],
                                  train_eval.images[SEL])
    np.testing.assert_array_equal(out['target_bbox_fid'],
                                  train_eval.bbox[SEL])
    assert out['target_center_fid'] is None
    np.testing.assert_array_equal(out['gt_cam2world'],
                                  train.tform_cam2world[SEL])
    # vpo == 1 -> no random-view target; perm cameras from train_eval.
    assert out['target_img_random'] is None
    cam, focal, center, bbox = out['perm_cameras']
    np.testing.assert_array_equal(cam, train_eval.tform_cam2world[PERM])
    np.testing.assert_array_equal(bbox, train_eval.bbox[PERM])


def test_trainsplit_protocol_ortho_cub():
    """CUB (ortho): the eval target is the UNCROPPED train image and no
    bbox is applied (run.py:1928-1934; loaders null CUB bbox/focal)."""
    train = _split('t')
    train.focal_length = None
    train_eval = _split('e')
    train_eval.focal_length = None
    cfg = {'views_per_object': 1, 'views_per_object_test': 0,
           'camera_projection_model': 'ortho'}
    out = select_inversion_targets('cub', cfg, False, False, train,
                                   train_eval, train_eval, SEL, PERM)
    np.testing.assert_array_equal(out['target_img'], train.images[SEL])
    np.testing.assert_array_equal(out['target_img_fid'], train.images[SEL])
    assert out['target_bbox_fid'] is None
    cam, focal, center, bbox = out['perm_cameras']
    assert focal is None and bbox is None


def test_trainsplit_demo_uses_cropped_targets():
    """Demo inference optimizes on the CROPPED train_eval image without
    eval bbox (run.py:1921-1926, 1941-1943)."""
    train = _split('t')
    train_eval = _split('e', with_bbox=True)
    cfg = {'views_per_object': 1, 'views_per_object_test': 0,
           'camera_projection_model': 'perspective'}
    out = select_inversion_targets('imagenet_car', cfg, False, True, train,
                                   train_eval, train_eval, SEL, PERM)
    np.testing.assert_array_equal(out['target_img'],
                                  train_eval.images[SEL])
    assert out['target_bbox_fid'] is None
    assert out['target_center_fid'] is None


def test_testset_protocol_shapenet():
    """shapenet test: all targets from the test split; novel-view
    cameras (incl. principal point) from the test split; random-view
    targets present (vpo_test > 1)."""
    train = _split('t')
    train_eval = _split('e')
    test = _split('x', with_center=True)
    cfg = {'views_per_object': 50, 'views_per_object_test': 251,
           'camera_projection_model': 'perspective'}
    out = select_inversion_targets('shapenet_cars', cfg, True, False,
                                   train, train_eval, test, SEL, PERM)
    np.testing.assert_array_equal(out['target_img'], test.images[SEL])
    np.testing.assert_array_equal(out['target_img_fid'], test.images[SEL])
    assert out['target_bbox_fid'] is None and out['target_center_fid'] is None
    np.testing.assert_array_equal(out['target_img_random'],
                                  test.images[PERM])
    cam, focal, center, bbox = out['perm_cameras']
    np.testing.assert_array_equal(cam, test.tform_cam2world[PERM])
    np.testing.assert_array_equal(center, test.center[PERM])
    np.testing.assert_array_equal(focal, test.focal_length[PERM])


def test_testset_protocol_p3d_perm_from_train_eval():
    """p3d test: novel-view cameras come from train_eval (test pose
    distribution unavailable, run.py:1895-1905) while images stay from
    the test split."""
    train = _split('t')
    train_eval = _split('e', with_bbox=True, with_center=True)
    test = _split('x')
    cfg = {'views_per_object': 1, 'views_per_object_test': 1,
           'camera_projection_model': 'perspective'}
    out = select_inversion_targets('p3d_car', cfg, True, False, train,
                                   train_eval, test, SEL, PERM)
    np.testing.assert_array_equal(out['target_img'], test.images[SEL])
    cam, focal, center, bbox = out['perm_cameras']
    np.testing.assert_array_equal(cam, train_eval.tform_cam2world[PERM])
    np.testing.assert_array_equal(center, train_eval.center[PERM])
    np.testing.assert_array_equal(bbox, train_eval.bbox[PERM])
    # vpo_test == 1 -> no random-view image target.
    assert out['target_img_random'] is None
