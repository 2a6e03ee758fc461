"""Media pipeline job — spark-submit entry for the multimodal column
family (engine/kernels/{multimodal,jpeg,gif}.py + engine/ops/media.py):
the job surface that was missing while the media operators were
registry/API-only (r4).

    spark-submit --py-files engine.zip jobs/media.py \
        --input /data/media --output /data/media_out \
        [--max-hamming 6] [--audio-hamming 6] [--frame-hop 256] \
        [--thumb-size 8]

Stages (each a plain parquet table under <output>/):

    features     one row per asset: kind, bytes, dims/rates, 64-bit
                 perceptual ahash, decode_status (typed stubs/errors
                 folded — never a task failure). Map-only Arrow pass
                 over size-bucketed splits.
    image_pairs  perceptual near-dup pairs over ahash (PNG/JPEG/GIF
                 alike — cross-format dups pair), hamming-banded
                 equi-join, never all-pairs.
    audio_pairs  amplitude-invariant energy-fingerprint near-dup
                 pairs over decodable WAVs, same banding core.
    frames       (opt-in, --frame-hop) per-hop audio frame energies.
    thumbs       (opt-in, --thumb-size) decoded-image thumbnails.

Prints ONE JSON line: per-kind/status counts + pair counts + wall
seconds. Works identically from `python jobs/media.py` in local mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from engine.session import get_spark  # noqa: E402


def run(args) -> dict:
    from engine.cli import fill_defaults
    from engine.ops.media import (
        audio_neardup_pairs,
        build_media_features,
        build_media_frames,
        build_media_thumbnails,
        image_neardup_pairs,
    )

    fill_defaults(args, _parser())
    spark = get_spark(
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        app_name="webtext-media",
    )
    t0 = time.monotonic()
    out = args.output
    media = spark.read.parquet(args.input)

    feats = build_media_features(
        media, num_partitions=args.num_partitions or None
    )
    feats.write.mode("overwrite").parquet(f"{out}/features")
    feats = spark.read.parquet(f"{out}/features")

    by_status = {
        f"{r['kind']}/{r['decode_status'].split(':')[0]}": r["n"]
        for r in feats.groupBy("kind", "decode_status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    img = image_neardup_pairs(feats, max_hamming=args.max_hamming)
    img.write.mode("overwrite").parquet(f"{out}/image_pairs")
    n_img = spark.read.parquet(f"{out}/image_pairs").count()

    aud = audio_neardup_pairs(
        media, max_hamming=args.audio_hamming, hop=args.frame_hop
    )
    aud.write.mode("overwrite").parquet(f"{out}/audio_pairs")
    n_aud = spark.read.parquet(f"{out}/audio_pairs").count()

    res = {
        "assets": feats.count(),
        "by_kind_status": by_status,
        "image_pairs": n_img,
        "audio_pairs": n_aud,
    }
    if args.frames:
        fr = build_media_frames(media, hop=args.frame_hop)
        fr.write.mode("overwrite").parquet(f"{out}/frames")
        res["frames"] = spark.read.parquet(f"{out}/frames").count()
    if args.thumb_size:
        th = build_media_thumbnails(media, args.thumb_size, args.thumb_size)
        th.write.mode("overwrite").parquet(f"{out}/thumbs")
        res["thumbs"] = spark.read.parquet(f"{out}/thumbs").count()

    res["wall_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(res, sort_keys=True))
    return res


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="media parquet (media_id, payload)")
    p.add_argument("--output", required=True)
    p.add_argument("--max-hamming", type=int, default=6)
    p.add_argument("--audio-hamming", type=int, default=6)
    p.add_argument(
        "--frame-hop", type=int, default=256,
        help="audio hop (fingerprint windows; --frames table rows)",
    )
    p.add_argument(
        "--frames", action="store_true",
        help="also write per-hop audio frame energies",
    )
    p.add_argument(
        "--thumb-size", type=int, default=0,
        help="also write NxN image thumbnails (0 = off)",
    )
    p.add_argument("--num-partitions", type=int, default=0)
    p.add_argument("--master", default="local[*]")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


if __name__ == "__main__":
    run(_parser().parse_args())
