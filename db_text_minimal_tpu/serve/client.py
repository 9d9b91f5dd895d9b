"""REST serving client.

Rebuild of ``src/ts_request.py``: POST an image, save the returned prob and
thresh masks as images.

Usage::

    python -m db_text_minimal_tpu.serve.client --image_path img.jpg \
        --host localhost --port 8080
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def load_args(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--image_path", type=str, default="./assets/foo.jpg")
    parser.add_argument("--model_name", type=str, default="dbtext")
    parser.add_argument("--mode", type=str, default="predictions")
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=str, default="8080")
    parser.add_argument("--out_dir", type=str, default="./tmp")
    parser.add_argument("--response", type=str, default="masks",
                        choices=("masks", "masks_png"),
                        help="masks = reference JSON-list contract; "
                             "masks_png = compact base64-PNG response")
    return parser.parse_args(argv)


def main(args):
    """``src/ts_request.py:24-39``."""
    import cv2
    import requests

    url = "http://{}:{}/{}/{}".format(args.host, args.port, args.mode,
                                      args.model_name)
    if args.response == "masks_png":
        url += "?mode=masks_png"
    with open(args.image_path, "rb") as f:
        data = f.read()
    start = time.time()
    resp = requests.post(url, data=data).text
    print("REST took: {}'s".format(time.time() - start))
    resp = json.loads(resp)
    if args.response == "masks_png":
        import base64
        import io

        from PIL import Image

        prob_mask = np.array(Image.open(io.BytesIO(
            base64.b64decode(resp["prob_png"]))))
        thresh_mask = np.array(Image.open(io.BytesIO(
            base64.b64decode(resp["thresh_png"]))))
    else:
        prob_mask = np.array(resp["prob_mask"]).astype(np.uint8)
        thresh_mask = np.array(resp["thresh_mask"]).astype(np.uint8)
    print(prob_mask.shape, thresh_mask.shape)
    os.makedirs(args.out_dir, exist_ok=True)
    cv2.imwrite(os.path.join(args.out_dir, "foo1.jpg"), prob_mask)
    cv2.imwrite(os.path.join(args.out_dir, "foo2.jpg"), thresh_mask)
    return prob_mask, thresh_mask


if __name__ == "__main__":
    main(load_args())
