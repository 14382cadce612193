"""MOT evaluation protocol details (VERDICT r1 item 4): ignore-region
filtering, skip-first-frame, CLEAR_MOT_M distractor handling, ID metrics,
and the JDE-reader gt/ignore split in read_mot_gt."""

import numpy as np

from lmsfc_tpu.datasets.catalogs import read_mot_gt
from lmsfc_tpu.evaluators.mot import MOTEval, MOTJDEEval, MOTTVDEval


def _pred(tid, tlwh):
    return {"track_id": tid, "tlwh": list(tlwh), "score": 1.0}


def _gt(gid, tlwh, cls=1, vis=1.0):
    return {"id": gid, "tlwh": list(tlwh), "class_id": cls, "visibility": vis}


BOX_A = (10, 10, 40, 80)
BOX_B = (200, 50, 40, 80)
BOX_C = (400, 100, 40, 80)


class TestIgnoreRegions:
    def test_ignored_hyp_not_counted_fp(self):
        """A hypothesis overlapping an ignore region is dropped before
        accumulation (ref evaluators.py:460-477), so it is not an FP."""
        ev = MOTEval()
        frame = {
            "gt": [_gt(1, BOX_A)],
            "gt_ignore": [{"id": 99, "tlwh": list(BOX_B)}],
        }
        preds = [_pred(7, BOX_A), _pred(8, BOX_B)]  # 8 sits on the ignore box
        for _ in range(3):
            ev.digest(frame, preds)
        res = ev.results()
        assert res["fp"] == 0
        assert res["mota"] == 100.0

    def test_unignored_hyp_still_fp(self):
        ev = MOTEval()
        frame = {"gt": [_gt(1, BOX_A)], "gt_ignore": [{"id": 99, "tlwh": list(BOX_B)}]}
        preds = [_pred(7, BOX_A), _pred(8, BOX_C)]  # C matches nothing
        ev.digest(frame, preds)
        assert ev.results()["fp"] == 1

    def test_filtering_can_be_disabled(self):
        ev = MOTEval(filter_ignore_regions=False)
        frame = {"gt": [_gt(1, BOX_A)], "gt_ignore": [{"id": 99, "tlwh": list(BOX_B)}]}
        ev.digest(frame, [_pred(7, BOX_A), _pred(8, BOX_B)])
        assert ev.results()["fp"] == 1


class TestSkipFirstFrame:
    def test_jde_eval_skips_frame_one(self):
        """Ref accumulates dataset[1:] only (evaluators.py:448)."""
        ev = MOTJDEEval()
        # frame 1: a miss that must NOT count
        ev.digest({"gt": [_gt(1, BOX_A)]}, [])
        # frames 2..4: perfect
        for _ in range(3):
            ev.digest({"gt": [_gt(1, BOX_A)]}, [_pred(7, BOX_A)])
        res = ev.results()
        assert res["num_gt"] == 3
        assert res["mota"] == 100.0


class TestClearMotM:
    def test_distractor_matched_hyp_removed(self):
        """CLEAR_MOT_M: hyps matched to distractor-class gt are removed and
        non-pedestrian gt is not scored (motmetrics semantics, ref :536-540)."""
        ev = MOTTVDEval()
        frame = {
            "gt": [
                _gt(1, BOX_A, cls=1),          # pedestrian
                _gt(2, BOX_B, cls=8),          # distractor
            ]
        }
        preds = [_pred(7, BOX_A), _pred(8, BOX_B)]
        for _ in range(2):
            ev.digest(frame, preds)
        res = ev.results()
        assert res["num_gt"] == 2          # only the pedestrian, 2 frames
        assert res["fp"] == 0              # distractor match removed, not FP
        assert res["mota"] == 100.0

    def test_static_person_class7(self):
        ev = MOTTVDEval()
        frame = {"gt": [_gt(1, BOX_A, cls=1), _gt(3, BOX_C, cls=7)]}
        ev.digest(frame, [_pred(7, BOX_A), _pred(9, BOX_C)])
        res = ev.results()
        assert res["fp"] == 0 and res["num_gt"] == 1


class TestTrajectoryMetrics:
    def test_idf1_perfect(self):
        ev = MOTEval()
        for _ in range(5):
            ev.digest({"gt": [_gt(1, BOX_A), _gt(2, BOX_B)]},
                      [_pred(7, BOX_A), _pred(8, BOX_B)])
        res = ev.results()
        assert res["idf1"] == 100.0
        assert res["mostly_tracked"] == 2
        assert res["mostly_lost"] == 0
        assert res["num_fragmentations"] == 0

    def test_idf1_id_flip_half(self):
        """Two ids swapping halfway: IDF1 = 50%, MOTA stays high."""
        ev = MOTEval()
        for _ in range(4):
            ev.digest({"gt": [_gt(1, BOX_A), _gt(2, BOX_B)]},
                      [_pred(7, BOX_A), _pred(8, BOX_B)])
        for _ in range(4):
            ev.digest({"gt": [_gt(1, BOX_A), _gt(2, BOX_B)]},
                      [_pred(8, BOX_A), _pred(7, BOX_B)])
        res = ev.results()
        assert res["idf1"] == 50.0
        assert res["mota"] >= 70.0  # only 2 switches over 16 gt

    def test_fragmentation_counted(self):
        ev = MOTEval()
        ev.digest({"gt": [_gt(1, BOX_A)]}, [_pred(7, BOX_A)])
        ev.digest({"gt": [_gt(1, BOX_A)]}, [])                 # gap
        ev.digest({"gt": [_gt(1, BOX_A)]}, [_pred(7, BOX_A)])  # re-acquire
        res = ev.results()
        assert res["num_fragmentations"] == 1
        assert res["partially_tracked"] == 1  # 2/3 coverage


class TestReadMotGt:
    def test_gt_ignore_split(self, tmp_path):
        """JDE reader semantics (ref datasets/image.py:370-383): gt keeps
        mark!=0 class-1 rows; ignore collects classes {2,7,8,12} / vis<0."""
        p = tmp_path / "gt.txt"
        p.write_text(
            "1,1,10,10,40,80,1,1,1.0\n"      # pedestrian -> gt
            "1,2,50,10,40,80,1,8,1.0\n"      # distractor -> ignore
            "1,3,90,10,40,80,0,1,1.0\n"      # mark 0 -> dropped from gt
            "1,4,130,10,40,80,1,7,1.0\n"     # static person -> ignore
            "1,5,170,10,40,80,1,1,-1\n"      # vis<0 -> ignore (not class)
            "2,1,10,12,40,80,1,1,1.0\n"
        )
        gt = read_mot_gt(p)
        ign = read_mot_gt(p, kind="ignore")
        assert [r["id"] for r in gt[1]] == [1, 5]
        assert [r["id"] for r in ign[1]] == [2, 4, 5]
        assert gt[1][0]["class_id"] == 1
        assert len(gt[2]) == 1

    def test_no_class_column(self, tmp_path):
        p = tmp_path / "gt.txt"
        p.write_text("1,1,10,10,40,80,1\n1,2,50,10,40,80,1\n")
        assert len(read_mot_gt(p)[1]) == 2
        assert read_mot_gt(p, kind="ignore") == {}
