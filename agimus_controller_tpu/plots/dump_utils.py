"""JSON plot-data sidecar dumps, format-compatible with the reference's
`plots/PLOT_DATA_FORMAT.md` / `plots/dump_utils.py:5` so downstream tooling
can consume either engine's dumps."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def dump_plot_data(
    filename,
    title: str,
    time,
    values,
    labels=None,
    ylabels=None,
    semilogs=None,
    ylimits=None,
    colors=None,
):
    """Dump plot data and metadata to a JSON file (reference schema)."""
    data = {
        "title": title,
        "time": np.asarray(time).tolist(),
        "values": np.asarray(values).tolist(),
        "labels": labels if labels is not None else [],
        "ylabels": ylabels if ylabels is not None else [],
        "semilogs": semilogs if semilogs is not None else [],
        "ylimits": ylimits if ylimits is not None else [],
        "colors": colors if colors is not None else [],
    }
    Path(filename).write_text(json.dumps(data, indent=2))
    return data


def dump_filename(dump_path, title: str) -> Path:
    """`<title>_plotdata.json` with spaces underscored (reference naming)."""
    return Path(dump_path) / (title.replace(" ", "_") + "_plotdata.json")
