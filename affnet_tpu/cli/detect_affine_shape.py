"""Estimate per-patch upright affine shape with AffNetFast.

Input: an HPatches-style patch-column image (H = N * W, each cell W x W).
Output: N rows 'a11 0 a21 a22' (%10.5f).

Reference CLI: examples/just_shape/detect_affine_shape.py:36-70.
Usage: python -m affnet_tpu.cli.detect_affine_shape imgs/face.png out.txt
"""

from __future__ import annotations

import argparse

import numpy as np


def load_patch_column(fname: str, ps: int = 32) -> np.ndarray:
    """Grayscale patch-column image -> (N, ps, ps) float patches in [0, 1].
    Cells are resized with bilinear interpolation (cv2 INTER_LINEAR in the
    reference, :43-46)."""
    from PIL import Image
    img = np.asarray(Image.open(fname).convert("L"), np.float32)
    h, w = img.shape
    n_patches = h // w
    out = np.zeros((n_patches, ps, ps), np.float32)
    for i in range(n_patches):
        cell = Image.fromarray(img[i * w:(i + 1) * w, 0:w])
        out[i] = np.asarray(cell.resize((ps, ps), Image.BILINEAR), np.float32)
    return out / 255.0


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_image")
    parser.add_argument("output_file")
    parser.add_argument("--weights", default="AffNetFast",
                        help="pretrained weight name or .npz path")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    from ..models import AffNetFast
    from ..models.convert import load_params_npz, load_pretrained
    from ..io_formats import write_upright_affine

    patches = load_patch_column(args.input_image, ps=AffNetFast.ps)
    if args.weights.endswith(".npz"):
        params = load_params_npz(args.weights)
    else:
        params = load_pretrained(args.weights)
    A = np.asarray(AffNetFast(params, jnp.asarray(patches)))
    write_upright_affine(args.output_file, A)
    print(f"{len(A)} affine shapes -> {args.output_file}")


if __name__ == "__main__":
    main()
