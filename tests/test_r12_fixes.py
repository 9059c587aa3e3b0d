"""Round-12 targeted-fix pins.

1. IVF-PQ probe ranking must skip padded duplicate coarse centers
   (r11 ADVICE): _pad_centroids repairs a degenerate Spark ML KMeans
   fit (fewer-than-k centers on clone data) by repeating the last
   center, and the ADD step's argmin tie-break means those padded
   cells are empty by construction — so a query probe array built
   over range(NCELLS) would burn nprobe slots on empty cells,
   displacing genuinely different cells and lowering recall.
   _first_occurrence_cells is the single source for "cells that can
   own vectors"; ann_ivf_pq builds its probe struct array over it.
"""

from __future__ import annotations

from data_webhooks_spark.operators.similarity import (
    _first_occurrence_cells,
    _pad_centroids,
)


def test_full_fit_probes_every_cell():
    coarse = [[float(i), float(i)] for i in range(8)]
    assert _first_occurrence_cells(coarse) == list(range(8))


def test_padded_fit_probes_only_real_cells():
    # degenerate fit: 3 real centers padded to 8
    real = [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]]
    coarse = _pad_centroids(list(real), 8)
    assert len(coarse) == 8
    cells = _first_occurrence_cells(coarse)
    assert cells == [0, 1, 2]
    # the displaced-recall failure mode: with nprobe=3, every probe
    # slot lands on a distinct REAL cell
    assert len(cells[:3]) == len(set(map(tuple, (coarse[i] for i in cells[:3]))))


def test_fully_degenerate_fit_probes_one_cell():
    # clone storm: every vector identical -> 1 center padded to 8
    coarse = _pad_centroids([[5.0, 5.0]], 8)
    assert _first_occurrence_cells(coarse) == [0]


def test_interior_duplicates_keep_first_occurrence():
    # robustness beyond padding: duplicates anywhere collapse to the
    # first index, matching the module-wide smallest-code tie-break
    coarse = [[0.0], [1.0], [0.0], [2.0], [1.0]]
    assert _first_occurrence_cells(coarse) == [0, 1, 3]
