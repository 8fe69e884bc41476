"""r14 bench self-adjudication contract (verdict items 2-3).

BENCH_r13 shipped box-noise-inflated numbers that needed judge
re-measurement, and the r13 stress replica rebuild silently changed
the physical layout. These tests pin the two fixes: the noise metric
(_spread over the two best shots) and the deterministic replica
layout (two builds from the same source produce identical per-file
row placement)."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pytest


class TestSpread:
    def test_spread_of_agreeing_shots_is_small(self):
        from bench import _spread

        assert _spread([1.0, 1.1]) == pytest.approx(1.1)
        assert _spread([2.0, 2.0, 9.0]) == pytest.approx(1.0)

    def test_cold_first_shot_resolved_by_confirming_shot(self):
        from bench import _spread

        # first two shots spread 2x -> adaptive third shot; the two
        # BEST (warm) shots agree, so the query is not noisy
        assert _spread([4.0, 2.0, 2.1]) == pytest.approx(2.1 / 2.0)

    def test_persistent_spread_is_noisy(self):
        from bench import _spread

        assert _spread([4.0, 2.0, 3.9]) > 1.5

    def test_budget_cut_shots_ignored(self):
        from bench import _spread

        assert _spread([-1.0]) == 1.0
        assert _spread([3.0]) == 1.0


class TestStressLayoutDeterminism:
    def test_two_builds_place_identical_rows_per_file(
        self, spark, sf_dir, tmp_path
    ):
        """Hash-partitioning on the primary id with a fixed file count
        makes the replica layout a pure function of the source — the
        property that makes round-over-round stress numbers
        comparable (SURVEY §6, r14)."""
        from tools.make_stress import build

        def sig(dst: Path) -> dict:
            # identify a file by its partition index (the part-NNNNN
            # prefix), not the full name — Spark embeds a random job
            # UUID in file names; determinism means the same ROWS land
            # in the same PARTITION
            out = {}
            for tdir in sorted(dst.glob("*.parquet")):
                import pyarrow.parquet as pq

                out[tdir.name] = sorted(
                    (f.name.split("-")[1], pq.read_metadata(f).num_rows)
                    for f in tdir.glob("*.parquet")
                )
            return out

        a, b = tmp_path / "rep_a", tmp_path / "rep_b"
        build(sf_dir, str(a), 2)
        build(sf_dir, str(b), 2)
        sig_a, sig_b = sig(a), sig(b)
        assert sig_a and sig_a == sig_b
        layout = json.loads((a / "_LAYOUT.json").read_text())
        assert set(layout) == {p.stem for p in a.glob("*.parquet")}
        for t, meta in layout.items():
            assert meta["rows"] > 0 and meta["files"] > 0
        # 2x replication doubles every table's rows exactly
        import pyarrow.parquet as pq

        for t, meta in layout.items():
            src_rows = pq.read_metadata(
                *list(Path(sf_dir).glob(f"{t}.parquet"))[:1]
            ).num_rows if (Path(sf_dir) / f"{t}.parquet").is_file() else (
                sum(
                    pq.read_metadata(f).num_rows
                    for f in (Path(sf_dir) / f"{t}.parquet").glob(
                        "*.parquet"
                    )
                )
            )
            assert meta["rows"] == 2 * src_rows
        shutil.rmtree(a, ignore_errors=True)
        shutil.rmtree(b, ignore_errors=True)
