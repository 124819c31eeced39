"""Per-verb semantic-role group extraction.

The reference repeats this nested Python grid scan inline in three places
(train_region_sort.py:134-179, train_sinkhorn.py:144-205,
eval_coco.py:149-167): for each control verb, walk the (fix_length, 8)
verb/SR grids and collect, per distinct SR value, the region slots carrying
it — producing the planner input sequence and the "needs re-ranking" SR set.

Here it is one host-side function producing metadata-sized outputs that feed
*batched* device calls (the planner/Sinkhorn consume whole batches of groups
at once instead of the reference's one-at-a-time model invocations). Runs in
the input pipeline, off the device critical path.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set

import numpy as np


@dataclass
class VerbGroup:
    verb: float                       # raw verb code (flickr keeps 10000*occ)
    det_sr_seq: np.ndarray            # (fix_length,) planner input SRs, 0-pad
    sr_find: Dict[int, List[int]]     # sr value -> slots carrying it
    need_re_rank: Set[int] = field(default_factory=set)
    gt_sr_seq: Optional[np.ndarray] = None


def extract_verb_groups(control_verb, det_seqs_v, det_seqs_sr,
                        gt_seqs_v=None, gt_seqs_sr=None,
                        max_sr: int = 10) -> List[VerbGroup]:
    """One caption's control grids -> list of VerbGroup (ref semantics).

    control_verb: (8,); det_seqs_v/det_seqs_sr: (fix_length, 8);
    optionally gt grids for training-target extraction.
    """
    control_verb = np.asarray(control_verb)
    det_seqs_v = np.asarray(det_seqs_v)
    det_seqs_sr = np.asarray(det_seqs_sr)
    groups: List[VerbGroup] = []
    fix_length = det_seqs_sr.shape[0]

    for verb in control_verb:
        if verb == 0:
            break
        det_sr_seq = np.zeros(fix_length, det_seqs_sr.dtype)
        find_sr = 0
        sr_find: Dict[int, List[int]] = {}
        need_re_rank: Set[int] = set()
        for j in range(det_seqs_v.shape[0]):
            for k in range(det_seqs_v.shape[1]):
                if det_seqs_v[j][k] == verb and find_sr < max_sr:
                    sr = int(det_seqs_sr[j][k])
                    if sr not in sr_find:
                        sr_find[sr] = [j]
                        det_sr_seq[find_sr] = det_seqs_sr[j][k]
                        find_sr += 1
                    else:
                        sr_find[sr].append(j)
                        need_re_rank.add(sr)
        if find_sr == 0:
            continue

        gt_sr_seq = None
        if gt_seqs_v is not None:
            gt_seqs_v_a = np.asarray(gt_seqs_v)
            gt_seqs_sr_a = np.asarray(gt_seqs_sr)
            gt_sr_seq = np.zeros(fix_length, gt_seqs_sr_a.dtype)
            find_gt = 0
            gt_seen: List[float] = []
            for j in range(gt_seqs_v_a.shape[0]):
                for k in range(gt_seqs_v_a.shape[1]):
                    if (gt_seqs_v_a[j][k] == verb and find_gt < max_sr
                            and gt_seqs_sr_a[j][k] not in gt_seen):
                        gt_seen.append(gt_seqs_sr_a[j][k])
                        gt_sr_seq[find_gt] = gt_seqs_sr_a[j][k]
                        find_gt += 1
            gt_sr_seq = gt_sr_seq
        groups.append(VerbGroup(verb=float(verb), det_sr_seq=det_sr_seq,
                                sr_find=sr_find, need_re_rank=need_re_rank,
                                gt_sr_seq=gt_sr_seq))
    return groups


def batch_planner_inputs(groups: List[VerbGroup]):
    """Stack groups into (verb (N,1), det_sr (N,L)[, gt_sr (N,L)]) arrays."""
    if not groups:
        return None
    verbs = np.asarray([[g.verb] for g in groups])
    det_sr = np.stack([g.det_sr_seq for g in groups])
    if groups[0].gt_sr_seq is not None:
        gt_sr = np.stack([g.gt_sr_seq for g in groups])
        return verbs, det_sr, gt_sr
    return verbs, det_sr
