"""Preprocessing tests: WSI backends, patching, segmentation, tile embedding."""

import os

import numpy as np
import pytest

from madeleine_tpu.preprocessing.patching import WSIPatcher, mag_to_px_size
from madeleine_tpu.preprocessing.segmentation import (
    TissueSegmenter,
    contours_to_mask,
    mask_to_contours,
)
from madeleine_tpu.preprocessing.tile_embedder import (
    HandcraftedEncoder,
    TileEmbedder,
)
from madeleine_tpu.preprocessing.wsi import NumpyWSI, get_pixel_size, wsi_factory


def _synthetic_slide(w=2048, h=1536, seed=0):
    """White background + two stained tissue blobs."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 245, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    blob1 = ((xx - 500) ** 2 + (yy - 400) ** 2) < 300 ** 2
    blob2 = ((xx - 1500) ** 2 / 2 + (yy - 1000) ** 2) < 250 ** 2
    tissue = blob1 | blob2
    color = np.stack([
        rng.integers(120, 200, tissue.sum()),
        rng.integers(40, 110, tissue.sum()),
        rng.integers(120, 200, tissue.sum()),
    ], axis=1).astype(np.uint8)
    img[tissue] = color
    return img, tissue


def test_numpy_wsi_read_region():
    img, _ = _synthetic_slide(512, 256)
    wsi = NumpyWSI(img, pixel_size=0.5)
    assert wsi.dimensions == (512, 256)
    region = wsi.read_region((100, 50), 0, (64, 32))
    np.testing.assert_array_equal(region, img[50:82, 100:164])
    # out-of-bounds read zero-pads
    region = wsi.read_region((500, 240), 0, (64, 64))
    assert region.shape == (64, 64, 3)
    assert get_pixel_size(wsi) == 0.5


def test_wsi_factory_dispatch(tmp_path):
    img, _ = _synthetic_slide(256, 256)
    assert isinstance(wsi_factory(img), NumpyWSI)
    from PIL import Image

    p = str(tmp_path / "slide.png")
    Image.fromarray(img).save(p)
    wsi = wsi_factory(p, pixel_size=1.0)
    assert wsi.dimensions == (256, 256)
    np.testing.assert_array_equal(wsi.read_region((0, 0), 0, (16, 16)),
                                  img[:16, :16])


def test_mag_to_px_size():
    assert mag_to_px_size(10) == 1.0
    assert mag_to_px_size(40) == 0.25
    assert abs(mag_to_px_size(16) - 0.625) < 1e-9


def test_patcher_grid_and_mask():
    img, tissue = _synthetic_slide()
    patcher = WSIPatcher(img, patch_size=128, src_pixel_size=0.5,
                         dst_pixel_size=1.0, mask=tissue.astype(np.uint8))
    assert len(patcher) > 0
    # patches should be 128px after the 2x downsample from a 256px source read
    tile, x, y = patcher[0]
    assert tile.shape == (128, 128, 3)
    assert patcher.src_patch_size == 256
    # every kept patch overlaps tissue; tiles over pure background are dropped
    total_cells = patcher.rows * patcher.cols
    assert len(patcher) < total_cells
    coords = patcher.coords
    assert coords.shape == (len(patcher), 2)
    # kept tile regions contain non-background pixels
    frac_tissue = tissue[y:y + 256, x:x + 256].mean()
    assert frac_tissue > 0.05


def test_patcher_corner_mode_matches_reference_semantics():
    img, tissue = _synthetic_slide()
    p_corner = WSIPatcher(img, 128, 0.5, dst_pixel_size=1.0,
                          mask=tissue.astype(np.uint8), corner_mode=True)
    p_area = WSIPatcher(img, 128, 0.5, dst_pixel_size=1.0,
                        mask=tissue.astype(np.uint8), min_tissue_frac=0.0001)
    # corner test is a subset-ish heuristic; both must find the tissue region
    assert len(p_corner) > 0 and len(p_area) > 0


def test_otsu_segmentation_finds_blobs(tmp_path):
    img, tissue = _synthetic_slide()
    seg = TissueSegmenter(save_path=str(tmp_path), min_area_um2=10_000)
    mask, contours, holes = seg.segment_tissue(img, pixel_size=0.5,
                                               save_bn="s1")
    assert len(contours) == 2  # two blobs
    # mask overlaps ground-truth tissue (scaled)
    import cv2

    gt = cv2.resize(tissue.astype(np.uint8), (mask.shape[1], mask.shape[0]),
                    interpolation=cv2.INTER_NEAREST)
    inter = (mask & gt).sum()
    union = (mask | gt).sum()
    assert inter / union > 0.6
    assert os.path.exists(str(tmp_path / "segmentation_vis" / "s1.jpg"))
    assert os.path.exists(str(tmp_path / "segmentation_pkl" / "s1.pkl"))

    # GeoJSON artifact (ref: geojson/<bn>_tissue_mask.geojson): valid
    # FeatureCollection of closed Polygons in slide coords
    import json

    geo_path = str(tmp_path / "geojson" / "s1_tissue_mask.geojson")
    assert os.path.exists(geo_path)
    with open(geo_path) as f:
        geo = json.load(f)
    assert geo["type"] == "FeatureCollection"
    assert len(geo["features"]) == 2
    w, h = img.shape[1], img.shape[0]
    for feat in geo["features"]:
        assert feat["geometry"]["type"] == "Polygon"
        assert "tissue_id" in feat["properties"]
        for ring in feat["geometry"]["coordinates"]:
            assert ring[0] == ring[-1], "GeoJSON rings must be closed"
            xs, ys = zip(*ring)
            assert 0 <= min(xs) and max(xs) <= w + 1
            assert 0 <= min(ys) and max(ys) <= h + 1


def test_model_backend_segmentation():
    img, tissue = _synthetic_slide()

    def fake_model(tiles):
        # "tissue" = dark pixels
        return (tiles.mean(axis=-1) < 220).astype(np.float32)

    seg = TissueSegmenter(backend="model", model_fn=fake_model,
                          min_area_um2=10_000, batch_size=8)
    mask, contours, _ = seg.segment_tissue(img, pixel_size=0.5)
    assert mask.sum() > 0
    assert len(contours) >= 1


def test_mask_contour_roundtrip():
    img, tissue = _synthetic_slide()
    contours, holes, _ = mask_to_contours(tissue.astype(np.uint8), 1.0,
                                          min_area_um2=10_000)
    recon = contours_to_mask(tissue.shape, contours, holes)
    inter = (recon & tissue).sum()
    union = (recon | tissue).sum()
    assert inter / union > 0.95


def test_tile_embedder_writes_reference_schema(tmp_path):
    from madeleine_tpu.data.io import load_coords, load_features

    img, tissue = _synthetic_slide()
    emb = TileEmbedder(encoder=HandcraftedEncoder(dim=64),
                       target_patch_size=64, target_mag=10,
                       batch_size=16, save_path=str(tmp_path))
    out = emb.embed_tiles(img, tissue.astype(np.uint8), "slideA",
                          pixel_size=0.5)
    feats = load_features(out)
    coords = load_coords(out)
    assert feats.shape[1] == 64
    assert feats.shape[0] == coords.shape[0] > 0
    assert np.all(np.isfinite(feats))


def test_full_preprocess_cli(tmp_path):
    """extract_patch_embeddings CLI end-to-end on a PNG slide."""
    import subprocess
    import sys

    from PIL import Image

    img, _ = _synthetic_slide()
    slide_dir = tmp_path / "slides"
    slide_dir.mkdir()
    Image.fromarray(img).save(str(slide_dir / "s1.png"))
    out_dir = tmp_path / "out"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, MADELEINE_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "bin", "extract_patch_embeddings.py"),
         "--slide_dir", str(slide_dir), "--local_dir", str(out_dir),
         "--patch_mag", "10", "--patch_size", "64", "--pixel_size", "0.5"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    (proc_dir,) = list(out_dir.iterdir())
    h5s = list((proc_dir / "patch_embeddings").glob("*.h5"))
    assert len(h5s) == 1
    from madeleine_tpu.data.io import load_features

    assert load_features(str(h5s[0])).shape[0] > 0


def test_torch_deeplab_adapter_gated():
    """The DeepLab adapter raises a clear ImportError when torchvision is
    absent (it is in this image); with torchvision it returns a model_fn."""
    from madeleine_tpu.preprocessing.segmentation import make_torch_deeplab_fn

    try:
        import torchvision  # noqa: F401
        has_tv = True
    except ImportError:
        has_tv = False

    if has_tv:
        fn = make_torch_deeplab_fn()
        out = fn(np.zeros((1, 64, 64, 3), np.uint8))
        assert out.shape == (1, 64, 64)
    else:
        with pytest.raises(ImportError, match="torchvision"):
            make_torch_deeplab_fn()
