"""Segment, patch, and embed a directory of slides (ref: bin/extract_patch_embeddings.py).

Usage:
    python extract_patch_embeddings.py --slide_dir <slides> --local_dir <out> \
        [--patch_mag 10] [--patch_size 256] [--encoder conch|handcrafted]

Per slide: tissue segmentation (Otsu backend by default; plug a model via the
library API), tissue-masked grid patching, batched tile encoding, h5 bag output
with the reference's {features, coords} schema.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from madeleine_tpu.utils.platform import apply_platform_env

apply_platform_env()

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s - %(levelname)s - %(message)s")
logger = logging.getLogger(__name__)

EXTENSIONS = (".svs", ".mrxs", ".tiff", ".tif", ".TIFF", ".ndpi",
              ".png", ".jpg", ".jpeg")


def process(slide_dir: str, out_dir: str, patch_mag: int, patch_size: int,
            encoder_name: str, pixel_size: float,
            vit_checkpoint: str = None) -> None:
    from madeleine_tpu.preprocessing.segmentation import TissueSegmenter
    from madeleine_tpu.preprocessing.tile_embedder import (
        HandcraftedEncoder, TileEmbedder, make_conch_encoder)
    from madeleine_tpu.preprocessing.wsi import get_pixel_size, wsi_factory

    fnames = [fn for fn in os.listdir(slide_dir) if fn.endswith(EXTENSIONS)]
    logger.info("Running segmentation, patching, and feature extraction on "
                "%d slides.", len(fnames))

    out_dir = os.path.join(
        out_dir, f"processing_{encoder_name}_nWSI_{len(fnames)}"
                 f"_mag_{patch_mag}x_patchsize_{patch_size}")
    seg_path = os.path.join(out_dir, "segmentation")
    os.makedirs(seg_path, exist_ok=True)

    if encoder_name == "conch":
        encoder = make_conch_encoder()
    elif encoder_name == "vit":
        from madeleine_tpu.preprocessing.vit import (JaxViTEncoder,
                                                     load_torch_vision_tower)
        if not vit_checkpoint:
            raise SystemExit("--encoder vit requires --vit_checkpoint "
                             "(torch checkpoint with a visual.* tower)")
        vcfg, vparams = load_torch_vision_tower(vit_checkpoint)
        encoder = JaxViTEncoder(vcfg, vparams)
    else:
        encoder = HandcraftedEncoder()
    segmenter = TissueSegmenter(save_path=seg_path, batch_size=64)
    embedder = TileEmbedder(encoder=encoder, target_patch_size=patch_size,
                            target_mag=patch_mag, save_path=out_dir)

    for fn in fnames:
        logger.info("processing %s", fn)
        wsi = wsi_factory(os.path.join(slide_dir, fn))
        px = get_pixel_size(wsi, default=pixel_size)
        bn = os.path.splitext(fn)[0]
        mask, _, _ = segmenter.segment_tissue(wsi, px, save_bn=bn)
        embedder.embed_tiles(wsi, mask, bn, pixel_size=px)

    logger.info("Done")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--slide_dir", type=str, default=None)
    parser.add_argument("--local_dir", type=str, default="./../data/downstream")
    parser.add_argument("--patch_mag", type=int, default=10)
    parser.add_argument("--patch_size", type=int, default=256)
    parser.add_argument("--encoder", type=str, default="handcrafted",
                        choices=["handcrafted", "conch", "vit"])
    parser.add_argument("--vit_checkpoint", type=str, default=None,
                        help="torch checkpoint with an open_clip visual.* "
                             "tower (runs on TPU via the JAX ViT)")
    parser.add_argument("--pixel_size", type=float, default=0.5,
                        help="fallback MPP when slide metadata lacks it")
    args = parser.parse_args()

    logger.info("Initiate run...")
    process(args.slide_dir, args.local_dir, args.patch_mag, args.patch_size,
            args.encoder, args.pixel_size, args.vit_checkpoint)
