"""Fold an IterationSink directory into the d3 player's JSON format.

The reference ships a d3.js viewer (``spark-tsne-player``) fed by a
JSON artifact produced off-band from the per-iteration CSVs
(``data/mnist/tsne.R:6-28``):

    {"iterations": [1, ..., 99, 100, 105, ...],
     "data": [{"key": k, "label": l, "pos": [{"x": ..., "y": ...}, ...]}]}

with all early-exaggeration iterations kept and every ``stride``-th
iteration after that (``tsne.R:16``). This module produces the same
shape from :class:`spark_tsne_spark.streaming.progress.IterationSink`
output, so the reference's viewer renders this engine's runs as-is.
Driver-side utility: the artifact is a visualization export, not a
distributed dataset.
"""

from __future__ import annotations

import csv
import json
import os
import re


def fold_progress_to_player_json(
    out_dir: str,
    json_path: str,
    labels: dict[int, int] | None = None,
    early_exaggeration: int = 100,
    stride: int = 5,
) -> dict:
    """Fold ``result%05d.csv`` files into the player JSON; returns the
    dict that was written."""
    files = sorted(
        f for f in os.listdir(out_dir) if re.fullmatch(r"result\d{5}\.csv", f)
    )
    if not files:
        raise FileNotFoundError(f"no result*.csv files in {out_dir}")
    per_iter: list[tuple[int, list[tuple[int, float, float]]]] = []
    for f in files:
        it = int(f[len("result") : -len(".csv")])
        rows = []
        with open(os.path.join(out_dir, f)) as fh:
            for rec in csv.reader(fh):
                # IterationSink rows: iteration, id, x, y
                rows.append((int(rec[1]), float(rec[2]), float(rec[3])))
        per_iter.append((it, rows))
    # reference subsampling: keep all early-exaggeration iterations,
    # then every `stride`-th (tsne.R:16)
    kept = [
        (it, rows)
        for it, rows in per_iter
        if it < early_exaggeration or (it - early_exaggeration) % stride == 0
    ]
    ids = [pid for pid, _x, _y in kept[0][1]]
    data = []
    for key, pid in enumerate(ids, start=1):
        pos = []
        for _it, rows in kept:
            by_id = {p: (x, y) for p, x, y in rows}
            x, y = by_id[pid]
            pos.append({"x": x, "y": y})
        data.append(
            {
                "key": key,
                "label": int(labels.get(pid, 0)) if labels else 0,
                "pos": pos,
            }
        )
    out = {"iterations": [it for it, _ in kept], "data": data}
    with open(json_path, "w") as fh:
        json.dump(out, fh)
    return out
