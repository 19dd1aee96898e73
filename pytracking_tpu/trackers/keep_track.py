"""KeepTrack tracker — SuperDiMP base + learned candidate association across frames.

Re-design of reference `pytracking/tracker/keep_track/keep_track.py` (KeepTrack:37,
localize_target_by_candidate_matching:256, extract_descriptors_and_keypoints:437) and
`candidates.py` (CandidateCollection:12).

TPU-first split (per SURVEY.md §7.2: "the candidate bookkeeping is host-side Python,
keep it so"):
  * Device step 1 (jitted): DiMP classification, top-K local-maxima candidate
    extraction (max-pool NMS + lax.top_k over fixed K slots with validity mask),
    descriptor extraction through the candidate-matching backbone, and the SuperGlue/
    Sinkhorn match against the previous frame's candidate slots.
  * Host: the `CandidateCollection` object-id bookkeeping — a dict over ≤K scalars,
    exactly the reference's association rules.
  * Device step 2 (jitted): state update for the selected candidate — position update,
    relative-space IoU-Net box refinement, certainty-weighted memory update and
    flag-gated classifier refresh.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from pytracking_tpu.ops import dcf
from pytracking_tpu.ops.patch import sample_patch
from pytracking_tpu.trackers.dimp import (DiMPParams, DiMPState, DiMPTracker,
                                          FLAG_HARD_NEG, FLAG_NAMES, FLAG_NORMAL,
                                          FLAG_NOT_FOUND, FLAG_UNCERTAIN,
                                          _get_iounet_box, _masked_slot_set)


@dataclass(frozen=True)
class KeepTrackParams(DiMPParams):
    """(reference pytracking/parameter/keep_track/default.py)"""
    image_sample_size: int = 30 * 16
    search_area_scale: float = 8.0
    border_mode: str = "inside_major"
    patch_max_scale_change: Optional[float] = 1.5
    box_refinement_space: str = "relative"
    box_refinement_iter: int = 10
    box_refinement_step_length: float = 2.5e-3
    local_max_candidate_score_th: float = 0.05
    max_candidates: int = 10
    use_certainty_for_weight_computation: bool = True
    certainty_for_weight_computation_ths: float = 0.5


class KeepTrackState(DiMPState):
    prev_cand_desc: jnp.ndarray = None       # (K, D)
    prev_cand_img_coords: jnp.ndarray = None  # (K, 2) x,y in patch pixels
    prev_cand_scores: jnp.ndarray = None     # (K,)
    prev_cand_valid: jnp.ndarray = None      # (K,) bool
    prev_cand_frame: jnp.ndarray = None      # () int32
    # certainty-weighted memory (reference keep_track.py:572-575,628-665)
    mem_certainties: jnp.ndarray = None      # (M,) per-slot label certainty
    # search-area rescaling after not-found (reference keep_track.py:228-236)
    target_not_found_counter: jnp.ndarray = None  # () int32
    scale_history: jnp.ndarray = None        # (60,) chronological, newest at [-1]
    scale_history_n: jnp.ndarray = None      # () int32 number of valid entries
    # device-side candidate association (functional twin of CandidateCollection,
    # fixed K slots; used by the fused single-dispatch track step)
    assoc_object_ids: jnp.ndarray = None     # (K,) int32, -1 = empty slot
    assoc_hist_scores: jnp.ndarray = None    # (K,) running max score per track
    assoc_selected_oid: jnp.ndarray = None   # () int32
    assoc_certain: jnp.ndarray = None        # () bool
    assoc_flag: jnp.ndarray = None           # () int32
    assoc_id_cntr: jnp.ndarray = None        # () int32
    assoc_active: jnp.ndarray = None         # () bool


class Candidate:
    def __init__(self, cid, score, coord, object_id):
        self.ids = [cid]
        self.scores = [score]
        self.coords = [coord]
        self.object_id = object_id


class CandidateCollection:
    """Host-side association bookkeeping (reference candidates.py:12-114)."""

    def __init__(self, scores, coords, candidate_selection_is_certain=True):
        self.candidates = {}
        self.object_id_cntr = 0
        self.flag = "normal"
        self.candidate_id_of_selected_candidate = 0
        self.object_id_of_selected_candidate = 0
        self.candidate_selection_is_certain = candidate_selection_is_certain
        if not candidate_selection_is_certain:
            self.object_id_of_selected_candidate = 1
            self.object_id_cntr = 1
        for cid, (score, coord) in enumerate(zip(scores, coords)):
            self.candidates[cid] = Candidate(cid, score, coord, self.object_id_cntr)
            self.object_id_cntr += 1

    def update(self, scores, coords, matches, match_scores):
        self._reassign(match_scores, matches, scores, coords)
        detected = self._check_object0_detected()
        detected = self._check_more_suitable(detected)
        if not detected:
            self._cleanup_not_found()
            self._reselect()

    def _reassign(self, match_scores, matches, scores, coords):
        candidates = {}
        for cid, (score, coord, match, mscore) in enumerate(
                zip(scores, coords, matches, match_scores)):
            if match >= 0 and match in self.candidates:
                candidate = self.candidates[match]
                low_prob = (mscore < 0.6 or (mscore < 0.85 and score < 0.2))
                if candidate.object_id == self.object_id_of_selected_candidate \
                        and low_prob:
                    candidate = Candidate(cid, score, coord, self.object_id_cntr)
                    self.object_id_cntr += 1
                else:
                    candidate.scores.append(score)
                    candidate.ids.append(cid)
                    candidate.coords.append(coord)
                candidates[cid] = candidate
            else:
                candidates[cid] = Candidate(cid, score, coord, self.object_id_cntr)
                self.object_id_cntr += 1
        self.candidates = candidates

    def _check_object0_detected(self):
        detected = False
        for cid, c in self.candidates.items():
            if c.object_id == self.object_id_of_selected_candidate:
                self.candidate_id_of_selected_candidate = cid
                self.flag = "normal"
                detected = True
                if max(c.scores) > 0.75:
                    self.candidate_selection_is_certain = True
        return detected

    def _check_more_suitable(self, detected):
        if detected and self.candidate_id_of_selected_candidate != 0 \
                and 0 in self.candidates:
            best = self.candidates[0]
            cur = self.candidates[self.candidate_id_of_selected_candidate]
            if max(best.scores) > max(cur.scores):
                self.flag = "normal"
                self.candidate_id_of_selected_candidate = 0
                self.object_id_of_selected_candidate = best.object_id
        return detected

    def _cleanup_not_found(self):
        self.candidate_id_of_selected_candidate = None
        if self.flag == "normal":
            self.flag = "not_found"
            self.candidate_selection_is_certain = False

    def _reselect(self):
        max_score = 0.0
        for cid, c in self.candidates.items():
            recent = c.scores[-1]
            if recent > 0.25 and recent > max_score:
                self.flag = "normal"
                self.candidate_id_of_selected_candidate = cid
                self.object_id_of_selected_candidate = c.object_id
                max_score = recent


class KeepTrackTracker(DiMPTracker):
    """params: KeepTrackParams; net: base DiMPnet; tcm_net/tcm_variables: the candidate
    matching network."""

    # the certainty-weighted update path does not honor defer_classifier_update
    supports_deferred_classifier_update = False

    def __init__(self, params: KeepTrackParams, net, variables, tcm_net=None,
                 tcm_variables=None, device_association: bool = True):
        """device_association=True (default) fuses part1 + candidate association +
        part2 into ONE jitted dispatch: the CandidateCollection rules run on-device
        over the K fixed slots (`_associate_device`), eliminating the per-frame
        host sync and making the whole tracker lax.scan-able (~353 FPS vs ~9 FPS
        for the split path in this harness). The host CandidateCollection path
        (the reference's split, property-tested equal in
        tests/test_round2_depth.py) remains available as the debug fallback."""
        super().__init__(params, net, variables)
        self.tcm_net = tcm_net
        self.tcm_variables = jax.device_put(tcm_variables) \
            if tcm_variables is not None else None
        # donate_state on every state->state step: the 50-slot sample memory is
        # reused in place (part1's state dies into part2; part2's into the next
        # frame). Without this the device copies the memory buffers per frame.
        self._jit_part1 = self._jit_with_variables(self._track_part1,
                                                   donate_state=True)
        self._jit_part1_patch = self._jit_with_variables(
            self._track_part1_from_patch, donate_state=True)
        self._jit_part2 = self._jit_with_variables(self._track_part2,
                                                   donate_state=True)
        self.device_association = device_association
        if device_association:
            self._jit_track = self._jit_with_variables(self._track_impl,
                                                       donate_state=True)
        self.candidate_collection: Optional[CandidateCollection] = None

    # ---------------------------------------------------------------- tcm helpers

    def _tcm_backbone(self, patch):
        return self.tcm_net.apply(self.tcm_variables, patch,
                                  method=lambda m, x: m.extract_backbone(x))

    def _tcm_descriptors(self, backbone_feat, coords):
        return self.tcm_net.apply(self.tcm_variables, backbone_feat, coords,
                                  method=lambda m, f, c: m.get_descriptors(f, c))

    def _tcm_match(self, c0, c1, d0, d1, s0, s1, v0, v1):
        return self.tcm_net.apply(
            self.tcm_variables, c0, c1, d0, d1, s0, s1,
            method=lambda m, a, b, x, y, u, w: m.match(a, b, x, y, u, w,
                                                       valid0=v0, valid1=v1))

    # ---------------------------------------------------------------- init

    def initialize(self, image, info: Dict[str, Any]) -> dict:
        out = super().initialize(image, info)
        K = self.params.max_candidates
        D = 256
        base = {f: getattr(self.state, f) for f in DiMPState.__dataclass_fields__}
        M = self.params.sample_memory_size
        self.state = KeepTrackState(
            **base,
            prev_cand_desc=jnp.zeros((K, D)),
            prev_cand_img_coords=jnp.zeros((K, 2)),
            prev_cand_scores=jnp.zeros((K,)),
            prev_cand_valid=jnp.zeros((K,), bool),
            prev_cand_frame=jnp.asarray(-10, jnp.int32),
            # init samples carry certainty 1 (reference init_target_label_certainties)
            mem_certainties=jnp.where(jnp.arange(M) < base["num_stored"], 1.0, 0.0),
            target_not_found_counter=jnp.asarray(0, jnp.int32),
            scale_history=jnp.zeros((60,)),
            scale_history_n=jnp.asarray(0, jnp.int32),
            assoc_object_ids=jnp.full((K,), -1, jnp.int32),
            assoc_hist_scores=jnp.zeros((K,)),
            assoc_selected_oid=jnp.asarray(0, jnp.int32),
            assoc_certain=jnp.asarray(True),
            assoc_flag=jnp.asarray(FLAG_NORMAL, jnp.int32),
            assoc_id_cntr=jnp.asarray(0, jnp.int32),
            assoc_active=jnp.asarray(False))
        self.candidate_collection = None
        self._frame_num_host = 1   # host-side mirror (avoids a device fetch)
        return out

    # ---------------------------------------------------------------- track

    def track(self, image, info: Optional[dict] = None) -> dict:
        p = self.params
        im_np, _ = self._prepare_image(image)
        im = jnp.asarray(im_np)
        if self.device_association:
            # split dispatch: shape-specialized crop + shape-independent step
            patch, coords = self._jit_crop(self.state, im)
            self.state, out = self._jit_track_patch(self.variables, self.state,
                                                    patch, coords)
            host = jax.device_get(out)
            flag_name = FLAG_NAMES[int(host["flag"])]
            bbox = np.asarray(host["target_bbox"]).tolist()
            if p.output_not_found_box and flag_name == "not_found":
                bbox = [-1, -1, -1, -1]
            result = {"target_bbox": bbox,
                      "max_score": float(host["max_score"]),
                      "object_presence_score": float(host["object_presence_score"]),
                      "flag": flag_name}
            if "score_map" in host:
                result["score_map"] = np.asarray(host["score_map"])
            return result

        patch, coords = self._jit_crop(self.state, im)
        state, part1 = self._jit_part1_patch(self.variables, self.state,
                                             patch, coords)
        self._frame_num_host += 1

        # fetch the small candidate arrays for host-side association in ONE
        # device_get (per-array np.asarray costs one blocking tunnel round-trip
        # each — 7 fetches were ~250 ms/frame through the remote-TPU link)
        host = jax.device_get({k: part1[k] for k in
                               ("cand_scores", "cand_coords", "cand_valid",
                                "matches", "match_scores", "max_score",
                                "prev_frame_gap")})
        cand_scores = host["cand_scores"]
        cand_coords = host["cand_coords"]                    # (K, 2) score-grid rc
        cand_valid = host["cand_valid"]
        matches = host["matches"]
        match_scores = host["match_scores"]
        max_score1 = float(host["max_score"])
        prev_frame_gap = int(host["prev_frame_gap"])

        K = int(cand_valid.sum())
        scores_l = cand_scores[:K].tolist()
        coords_l = [cand_coords[i] for i in range(K)]

        use_matching = max_score1 >= p.local_max_candidate_score_th and K > 0
        sel_is_grid = False
        if not use_matching or prev_frame_gap > 1 or self.candidate_collection is None:
            # fall back to standard DiMP localization (device already computed it)
            sel_coord = np.asarray(part1["default_disp"])
            flag_code = int(part1["default_flag"])
            cand_score = max_score1
            if use_matching:
                self.candidate_collection = CandidateCollection(
                    scores_l, coords_l,
                    candidate_selection_is_certain=self._frame_num_host < 10)
            else:
                self.candidate_collection = None
        else:
            self.candidate_collection.update(scores_l, coords_l,
                                             matches[:K].tolist(),
                                             match_scores[:K].tolist())
            cid = self.candidate_collection.candidate_id_of_selected_candidate
            if cid is None or cid >= K:
                sel_coord = np.asarray(part1["default_disp"])
                flag_code = FLAG_NOT_FOUND
                cand_score = max_score1
            else:
                sel_coord = cand_coords[cid]
                sel_is_grid = True
                flag_code = {"normal": FLAG_NORMAL,
                             "not_found": FLAG_NOT_FOUND}[
                    self.candidate_collection.flag]
                cand_score = float(cand_scores[cid])

        # reference keep_track.py:150-152,183-184: object-0 selections get a sqrt
        # certainty boost; the raw certainty is the score-map max
        is_object0 = (self.candidate_collection is None
                      or self.candidate_collection.object_id_of_selected_candidate == 0)

        self.state, out = self._jit_part2(
            self.variables, state, part1["backbone_l2"], part1["backbone_l3"], part1["test_x"],
            part1["sample_pos"], part1["sample_scale"],
            jnp.asarray(sel_coord, jnp.float32), jnp.asarray(sel_is_grid),
            jnp.asarray(flag_code, jnp.int32),
            jnp.asarray(cand_score, jnp.float32),
            jnp.asarray(max_score1, jnp.float32), jnp.asarray(is_object0))

        presence = max(max_score1, math.sqrt(max(max_score1, 0.0))) \
            if is_object0 else max_score1
        out = jax.device_get(out)   # one transfer for bbox/score/flag
        flag_name = FLAG_NAMES[int(out["flag"])]
        bbox = np.asarray(out["target_bbox"]).tolist()
        if self.params.output_not_found_box and flag_name == "not_found":
            bbox = [-1, -1, -1, -1]   # reference keep_track.py:206-209
        return {"target_bbox": bbox,
                "max_score": float(out["max_score"]),
                "object_presence_score": float(presence),
                "flag": flag_name}

    # ---------------------------------------------------------------- device step 1

    def _track_part1(self, state: KeepTrackState, im):
        patch, coords = self._track_crop_impl(state, im)
        return self._track_part1_from_patch(state, patch, coords)

    def _track_part1_from_patch(self, state: KeepTrackState, patch, coords):
        p = self.params
        img_sample_sz = jnp.array(self._img_sample_sz, jnp.float32)
        feat_sz = float(self._feature_sz)
        score_sz = self._score_sz
        # displacement grid: score_sz - (ksz+1)%2 (reference keep_track.py:306)
        output_sz = float(score_sz) - (p.kernel_size + 1) % 2
        K = p.max_candidates

        state = state.replace(frame_num=state.frame_num + 1)
        sample_pos = 0.5 * (coords[:2] + coords[2:])
        sample_scale = jnp.sqrt(jnp.prod((coords[2:] - coords[:2]) / img_sample_sz))

        backbone_feat = self._backbone(patch[None])
        test_x = self._clf_feat(backbone_feat)
        scores = self._classify(state.target_filter, test_x)[0, :, :, 0]

        # default DiMP localization (used when matching is skipped)
        trans_default, flag_default, max_score = self._localize(
            state, scores, sample_pos, sample_scale, output_sz, img_sample_sz)

        # ---- top-K local maxima (reference find_local_maxima,
        #      processing_utils.py:669-706): 5x5 max-pool NMS, threshold, sort
        ks = 5
        pooled = lax.reduce_window(scores, -jnp.inf, lax.max, (ks, ks), (1, 1),
                                   "SAME")
        peak_mask = (scores == pooled) & (scores > p.local_max_candidate_score_th)
        flat = jnp.where(peak_mask.reshape(-1), scores.reshape(-1), -jnp.inf)
        topv, topi = lax.top_k(flat, K)
        cand_valid = jnp.isfinite(topv)
        rr = (topi // score_sz).astype(jnp.float32)
        cc = (topi % score_sz).astype(jnp.float32)
        cand_coords = jnp.stack([rr, cc], axis=-1)                  # score-grid (r, c)
        cand_scores = jnp.where(cand_valid, topv, 0.0)

        # ---- descriptors at candidate locations through the matching backbone
        tcm_feat = self._tcm_backbone(patch[None])
        # score-grid -> tsm feature-grid coords (both stride 16; clip handles border)
        desc = self._tcm_descriptors(tcm_feat, cand_coords[None].astype(jnp.int32))[0]

        # ---- match against the previous frame's candidates
        # img coords (x, y) in patch pixels (reference keep_track.py:437-470)
        stride = float(p.feature_stride)
        img_coords = jnp.stack([cand_coords[:, 1] * stride + stride / 2,
                                cand_coords[:, 0] * stride + stride / 2], axis=-1)
        pred = self._tcm_match(state.prev_cand_img_coords[None], img_coords[None],
                               state.prev_cand_desc[None], desc[None],
                               state.prev_cand_scores[None], cand_scores[None],
                               state.prev_cand_valid[None], cand_valid[None])
        assign = jnp.exp(pred["log_assignment"][0])                 # (K+1, K+1)
        # for each current candidate j: best previous candidate i (or dustbin)
        col = assign[:, :K]                                         # (K+1, K)
        best_prev = jnp.argmax(col[:K], axis=0)                     # (K,)
        best_prob = jnp.max(col[:K], axis=0)
        dustbin_prob = col[K]
        matches = jnp.where(best_prob > dustbin_prob, best_prev, -1)
        match_scores = best_prob

        prev_frame_gap = state.frame_num - state.prev_cand_frame

        # store current candidates as "previous" for the next frame
        state = state.replace(prev_cand_desc=desc,
                              prev_cand_img_coords=img_coords,
                              prev_cand_scores=cand_scores,
                              prev_cand_valid=cand_valid,
                              prev_cand_frame=state.frame_num)

        default_disp = trans_default  # image-coord translation vector
        p1 = {
            "cand_scores": cand_scores, "cand_coords": cand_coords,
            "cand_valid": cand_valid, "matches": matches,
            "match_scores": match_scores, "max_score": max_score,
            "default_disp": default_disp, "default_flag": flag_default,
            "prev_frame_gap": prev_frame_gap,
            "backbone_l2": backbone_feat["layer2"],
            "backbone_l3": backbone_feat["layer3"], "test_x": test_x,
            "sample_pos": sample_pos, "sample_scale": sample_scale,
        }
        if self._debug_outputs:
            p1["scores"] = scores
        return state, p1

    # ------------------------------------------------ device-side association

    def _associate_device(self, state: KeepTrackState, p1):
        """CandidateCollection as pure array ops over K fixed slots (functional twin
        of reference candidates.py:12-114; tested against the host class). Returns
        (state, sel_coord, sel_is_grid, flag, cand_score, is_object0)."""
        p = self.params
        K = p.max_candidates
        idxs = jnp.arange(K)
        cand_scores = p1["cand_scores"]
        cand_valid = p1["cand_valid"]
        matches = p1["matches"]
        match_scores = p1["match_scores"]
        max_score = p1["max_score"]
        n_valid = cand_valid.sum()

        use_matching = (max_score >= p.local_max_candidate_score_th) & (n_valid > 0)
        do_update = use_matching & state.assoc_active & \
            (p1["prev_frame_gap"] <= 1)
        do_create = use_matching & ~do_update

        NORMAL = jnp.asarray(FLAG_NORMAL, jnp.int32)
        NOT_FOUND = jnp.asarray(FLAG_NOT_FOUND, jnp.int32)

        # ---- create (candidates.py:13-25): ids 0.. when certain else 1..,
        # selected = slot 0 (slots arrive sorted by score)
        cr_certain = state.frame_num < 10
        offset = jnp.where(cr_certain, 0, 1).astype(jnp.int32)
        cr_ids = jnp.where(cand_valid, idxs + offset, -1).astype(jnp.int32)
        cr_hist = jnp.where(cand_valid, cand_scores, 0.0)
        cr_sel_oid = offset
        cr_id_cntr = offset + n_valid.astype(jnp.int32)

        # ---- update (candidates.py:27-114)
        prev_ids = state.assoc_object_ids
        prev_hist = state.assoc_hist_scores
        sel_oid = state.assoc_selected_oid
        m_safe = jnp.maximum(matches, 0)
        matched = cand_valid & (matches >= 0) & (prev_ids[m_safe] >= 0)
        inh_oid = prev_ids[m_safe]
        low_prob = (match_scores < 0.6) | ((match_scores < 0.85) &
                                           (cand_scores < 0.2))
        steal = matched & (inh_oid == sel_oid) & low_prob
        new_needed = cand_valid & ((~matched) | steal)
        rank = jnp.cumsum(new_needed.astype(jnp.int32)) - \
            new_needed.astype(jnp.int32)
        new_ids = state.assoc_id_cntr + rank
        up_ids = jnp.where(cand_valid,
                           jnp.where(new_needed, new_ids, inh_oid),
                           -1).astype(jnp.int32)
        # host aliasing semantics (candidates.py:36-47): slots matching the SAME
        # previous candidate share one Candidate object — their score histories
        # merge, and scores[-1] ("recent", used by reselect) is the LAST sharer's
        # score this frame
        keep = matched & ~steal
        # group by OBJECT identity (= inherited oid): two prev slots can hold the
        # same shared object, so keying on the matched slot index is not enough
        grp = keep[:, None] & keep[None, :] & \
            (inh_oid[:, None] == inh_oid[None, :])
        shared_max = jnp.max(jnp.where(grp, cand_scores[None, :], -jnp.inf),
                             axis=1)
        last_sharer = jnp.max(jnp.where(grp, idxs[None, :], -1), axis=1)
        recent = jnp.where(keep,
                           cand_scores[jnp.maximum(last_sharer, 0)], cand_scores)
        up_hist = jnp.where(keep,
                            jnp.maximum(prev_hist[m_safe], shared_max),
                            cand_scores)
        up_hist = jnp.where(cand_valid, up_hist, 0.0)
        up_id_cntr = state.assoc_id_cntr + new_needed.sum().astype(jnp.int32)

        # detected? (candidates.py:64-79 — last matching cid wins)
        matchmask = cand_valid & (up_ids == sel_oid)
        detected = matchmask.any()
        sel_cid_det = jnp.max(jnp.where(matchmask, idxs, -1)).astype(jnp.int32)
        certain_det = state.assoc_certain | (matchmask & (up_hist > 0.75)).any()
        flag_det = NORMAL

        # more suitable candidate at slot 0? (candidates.py:81-92)
        better0 = detected & (sel_cid_det != 0) & cand_valid[0] & \
            (up_hist[0] > up_hist[jnp.maximum(sel_cid_det, 0)])
        sel_cid_det = jnp.where(better0, 0, sel_cid_det)
        sel_oid_det = jnp.where(better0, up_ids[0], sel_oid)

        # not detected: cleanup + reselect on each track's most-recent score
        # (candidates.py:94-114)
        flag_nf0 = jnp.where(state.assoc_flag == NORMAL, NOT_FOUND,
                             state.assoc_flag)
        recent_ok = cand_valid & (recent > 0.25)
        any_ok = recent_ok.any()
        best = jnp.argmax(jnp.where(recent_ok, recent,
                                    -jnp.inf)).astype(jnp.int32)
        sel_cid_nf = jnp.where(any_ok, best, -1)
        sel_oid_nf = jnp.where(any_ok, up_ids[jnp.maximum(best, 0)], sel_oid)
        flag_nf = jnp.where(any_ok, NORMAL, flag_nf0)

        up_sel_cid = jnp.where(detected, sel_cid_det, sel_cid_nf)
        up_sel_oid = jnp.where(detected, sel_oid_det, sel_oid_nf)
        up_flag = jnp.where(detected, flag_det, flag_nf)
        up_certain = jnp.where(detected, certain_det, False)

        # ---- merge the three cases into the persistent association state
        def pick(cr, up, prev):
            return jnp.where(do_create, cr, jnp.where(do_update, up, prev))

        state = state.replace(
            assoc_object_ids=pick(cr_ids, up_ids, state.assoc_object_ids),
            assoc_hist_scores=pick(cr_hist, up_hist, state.assoc_hist_scores),
            assoc_selected_oid=pick(cr_sel_oid, up_sel_oid,
                                    state.assoc_selected_oid),
            assoc_certain=pick(cr_certain, up_certain, state.assoc_certain),
            assoc_flag=pick(NORMAL, up_flag, state.assoc_flag),
            assoc_id_cntr=pick(cr_id_cntr, up_id_cntr, state.assoc_id_cntr),
            assoc_active=use_matching)

        # ---- selection output (track() routing in the host path)
        has_cand = do_update & (up_sel_cid >= 0)
        sel_coord = jnp.where(has_cand,
                              p1["cand_coords"][jnp.maximum(up_sel_cid, 0)],
                              p1["default_disp"])
        flag = jnp.where(has_cand, up_flag,
                         jnp.where(do_update, NOT_FOUND,
                                   p1["default_flag"].astype(jnp.int32)))
        cand_score = jnp.where(has_cand,
                               cand_scores[jnp.maximum(up_sel_cid, 0)], max_score)
        is_object0 = jnp.where(use_matching, state.assoc_selected_oid == 0, True)
        return state, sel_coord, has_cand, flag, cand_score, is_object0

    # _track_impl is inherited from DiMPTracker: crop + _track_from_patch —
    # the fully fused single-dispatch step (device_association mode): part1 +
    # on-device association + part2. lax.scan-able.
    def _track_from_patch(self, state: KeepTrackState, patch, coords):
        state, p1 = self._track_part1_from_patch(state, patch, coords)
        state, sel_coord, sel_is_grid, flag, cand_score, is_object0 = \
            self._associate_device(state, p1)
        state, out = self._track_part2(
            state, p1["backbone_l2"], p1["backbone_l3"], p1["test_x"],
            p1["sample_pos"], p1["sample_scale"], sel_coord, sel_is_grid, flag,
            cand_score, p1["max_score"], is_object0)
        out["object_presence_score"] = jnp.where(
            is_object0,
            jnp.maximum(p1["max_score"],
                        jnp.sqrt(jnp.maximum(p1["max_score"], 0.0))),
            p1["max_score"])
        if self._debug_outputs:
            out["score_map"] = p1["scores"]
        return state, out

    # ---------------------------------------------------------------- device step 2

    def _track_part2(self, state: KeepTrackState, backbone_l2, backbone_l3, test_x,
                     sample_pos, sample_scale, sel_coord, sel_is_grid, flag,
                     cand_score, certainty, is_object0):
        """sel_coord: a score-grid (r, c) candidate coordinate when sel_is_grid
        (matching selected a candidate; flag from the collection), else directly an
        image-coord translation (fallback path passes `default_disp`)."""
        p = self.params
        img_sample_sz = jnp.array(self._img_sample_sz, jnp.float32)
        score_sz = float(self._score_sz)
        # reference keep_track.py:306-309: displacement maps through
        # score_sz - (ksz+1)%2 cells, center stays (score_sz-1)/2
        output_sz = score_sz - (p.kernel_size + 1) % 2
        score_center = (score_sz - 1) / 2

        disp_from_grid = (sel_coord - score_center) * \
            (img_sample_sz / output_sz) * sample_scale
        translation = jnp.where(sel_is_grid, disp_from_grid, sel_coord)
        new_pos = sample_pos + translation

        found = flag != FLAG_NOT_FOUND

        def clamp_pos(pos_new, sz):
            inside_offset = (p.target_inside_ratio - 0.5) * sz
            return jnp.maximum(jnp.minimum(pos_new, state.image_sz - inside_offset),
                               inside_offset)

        state = state.replace(pos=jnp.where(found,
                                            clamp_pos(new_pos, state.target_sz),
                                            state.pos))

        # search-area rescaling (reference keep_track.py:228-236): on not_found grow
        # the scale back toward recent larger scales; on found push the pre-refinement
        # scale into the history and reset the counter
        state = lax.cond(found, self._push_scale_history,
                         self._search_area_rescaling, state)

        backbone_feat = {"layer2": backbone_l2, "layer3": backbone_l3}
        if p.use_iou_net:
            update_scale = jnp.where(
                p.update_scale_when_uncertain | (flag != FLAG_UNCERTAIN), True, False)
            state = self._refine_target_box(state, backbone_feat, sample_pos,
                                            sample_scale, img_sample_sz, found,
                                            update_scale)

        update_flag = (flag != FLAG_NOT_FOUND) & (flag != FLAG_UNCERTAIN)
        hard_negative = flag == FLAG_HARD_NEG
        if p.update_classifier:
            target_box = _get_iounet_box(state.pos, state.target_sz, sample_pos,
                                         sample_scale, img_sample_sz)
            lr = jnp.where(hard_negative, p.hard_negative_learning_rate,
                           p.learning_rate)
            # certainty-weighted memory (reference keep_track.py:628-665): object-0
            # selections get a sqrt certainty boost; the slot with the lowest
            # certainty*weight is replaced
            cert_store = jnp.where(is_object0,
                                   jnp.maximum(certainty,
                                               jnp.sqrt(jnp.maximum(certainty, 0.0))),
                                   certainty)
            state = self._update_memory_certainty(state, test_x[0], target_box, lr,
                                                  update_flag, cert_store)
            state = self._update_classifier_certainty(state, hard_negative,
                                                      update_flag, certainty)

        state = state.replace(flag=flag.astype(jnp.int32), max_score=cand_score)
        bbox = jnp.concatenate([state.pos[::-1] - (state.target_sz[::-1] - 1) / 2,
                                state.target_sz[::-1]])
        out = {"target_bbox": bbox, "max_score": cand_score, "flag": flag}
        return state, out

    # ------------------------------------------------- search-area rescaling

    def _push_scale_history(self, state: KeepTrackState):
        """Found frame: append the current (pre-refinement) scale, reset the counter
        (reference keep_track.py:163-165)."""
        hist = jnp.roll(state.scale_history, -1).at[-1].set(state.target_scale)
        return state.replace(
            scale_history=hist,
            scale_history_n=jnp.minimum(state.scale_history_n + 1, 60),
            target_not_found_counter=jnp.asarray(0, jnp.int32))

    def _search_area_rescaling(self, state: KeepTrackState):
        """Not-found frame: set target_scale to the mean of the most recent
        `num_scales` history entries that are >= the newest one, where num_scales
        grows with consecutive not-found frames (reference keep_track.py:228-236)."""
        counter = state.target_not_found_counter + 1
        num_scales = jnp.clip(counter, 2, 30)
        hist = state.scale_history
        n = state.scale_history_n
        valid = jnp.arange(60) >= (60 - n)
        newest = hist[-1]
        keep = valid & (hist >= newest)
        # rank from the end among kept entries: 1 = newest kept entry
        rev_rank = jnp.cumsum(keep[::-1])[::-1]
        sel = keep & (rev_rank <= num_scales)
        mean = jnp.sum(jnp.where(sel, hist, 0.0)) / jnp.maximum(jnp.sum(sel), 1)
        new_scale = jnp.where(n > 0, mean, state.target_scale)
        return state.replace(target_scale=new_scale,
                             target_not_found_counter=counter)

    # ------------------------------------------- certainty-weighted memory

    def _update_memory_certainty(self, state: KeepTrackState, sample, target_box, lr,
                                 do_update, cert_store):
        """DiMP's weighted-replacement update, but the replaced slot is the one with
        the minimum certainty*weight (reference keep_track.py:628-665,667-733) and the
        per-slot certainty memory is written alongside."""
        p = self.params
        sw = state.mem_weights
        M = p.sample_memory_size
        num_init = state.num_init
        num_stored = state.num_stored

        init_w = p.init_samples_minimum_weight
        s_ind = jnp.where(init_w > 0, num_init, 0)

        idx = jnp.arange(M)
        if p.use_certainty_for_weight_computation:
            # reference keep_track.py:633: certainties = cert * sample_weights
            replace_key = state.mem_certainties * sw
        else:
            replace_key = sw
        masked_key = jnp.where(idx >= s_ind, replace_key, jnp.inf)
        r_ind_full = jnp.argmin(masked_key).astype(jnp.int32)
        r_ind = jnp.where(num_stored < M, num_stored, r_ind_full).astype(jnp.int32)

        prev = state.prev_ind
        sw_new = jnp.where(prev < 0, sw / (1 - lr), sw)
        new_w = jnp.where(prev < 0, lr, sw[jnp.maximum(prev, 0)] / (1 - lr))
        sw_new = sw_new.at[r_ind].set(new_w)
        sw_new = sw_new / sw_new.sum()
        if init_w and init_w > 0:
            init_mask = idx < num_init
            init_sum = jnp.where(init_mask, sw_new, 0.0).sum()
            rest_sum = jnp.where(~init_mask, sw_new, 0.0).sum()
            need = init_sum < init_w
            scale = 1.0 / (init_w + rest_sum)
            sw_adj = jnp.where(init_mask, init_w / jnp.maximum(num_init, 1),
                               sw_new * scale)
            sw_new = jnp.where(need, sw_adj, sw_new)

        return state.replace(
            mem_samples=_masked_slot_set(state.mem_samples, r_ind, sample,
                                         do_update),
            mem_boxes=_masked_slot_set(state.mem_boxes, r_ind, target_box,
                                       do_update),
            mem_weights=jnp.where(do_update, sw_new, state.mem_weights),
            mem_certainties=_masked_slot_set(state.mem_certainties, r_ind,
                                             cert_store, do_update),
            num_stored=jnp.where(do_update,
                                 jnp.minimum(num_stored + 1, M), num_stored),
            prev_ind=jnp.where(do_update, r_ind, state.prev_ind))

    def _update_classifier_certainty(self, state: KeepTrackState, hard_negative,
                                     update_flag, certainty):
        """Filter-optimizer refresh with certainty-suppressed sample weights
        (reference keep_track.py:886-898): slots with certainty below the threshold
        contribute nothing; hard-negative refreshes are skipped when the new sample
        itself is below the threshold (keep_track.py:869-872)."""
        p = self.params
        skip_update = ((state.frame_num - 1) % p.train_skipping) == 0

        if p.use_certainty_for_weight_computation:
            ths = p.certainty_for_weight_computation_ths
            hn_ok = certainty >= ths
            cert = state.mem_certainties
            w = state.mem_weights * jnp.where(cert >= ths, cert, 0.0)
        else:
            hn_ok = jnp.asarray(True)
            w = state.mem_weights

        branch_idx = jnp.where(update_flag & hard_negative & hn_ok, 1,
                               jnp.where(update_flag & skip_update, 2, 0))

        feat = state.mem_samples[:, None]
        bb = state.mem_boxes[:, None]
        sw = w[:, None]

        def no_update(f):
            return f

        def hn_update(f):
            return self._run_optimizer(f, feat, bb, sw, p.net_opt_hn_iter)[0]

        def periodic_update(f):
            return self._run_optimizer(f, feat, bb, sw, p.net_opt_update_iter)[0]

        new_filter = lax.switch(branch_idx, [no_update, hn_update, periodic_update],
                                state.target_filter)
        return state.replace(target_filter=new_filter)


def get_tracker_class():
    return KeepTrackTracker
