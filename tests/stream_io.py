"""Shared streaming-test file-source helpers.

``df.write.mode("append").text(dir)`` lands part files one by one as
tasks commit, while an already-running file-source stream triggers
continuously — under host load a trigger can pick up a SUBSET of a
logical batch, splitting it across micro-batches in file order rather
than time order (the round-4 EWMA flake, re-observed in round 5 on the
velocity-rule parity test).  These helpers stage each logical batch to a
scratch dir as ONE file and ``os.rename`` it into the source dir: POSIX
rename is atomic, so the stream sees the whole batch or nothing.
"""

from __future__ import annotations

import itertools
import os
import shutil

from pyspark.sql import functions as F

_counter = itertools.count()


def atomic_json_append(df, src_dir: str) -> None:
    """Append *df* to text-file source *src_dir* as one atomic JSON file."""
    i = next(_counter)
    stage = f"{src_dir}.__stage{i}"
    df.coalesce(1).select(
        F.to_json(F.struct(*df.columns)).alias("v")
    ).write.text(stage)
    part = next(
        p for p in os.listdir(stage)
        if p.startswith("part-") and p.endswith(".txt")
    )
    os.makedirs(src_dir, exist_ok=True)
    os.rename(f"{stage}/{part}", f"{src_dir}/batch{i}.txt")
    shutil.rmtree(stage, ignore_errors=True)
