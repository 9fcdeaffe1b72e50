"""BoW database: per-frame vectors, inverted file, shared-word queries and
batched L1 scoring.

Replaces ``src/bow/database.cc``. The inverted file
(``vector<map<FramePtr, vector<int>>>``, database.h:94) becomes
word_id → {frame_id: [feature indices]}; shared-word counting
(database.cc:111-123) walks it identically. For ranking many candidates the
dense path stacks L1-normalized word vectors into a matrix and scores a query
against all frames with one matmul-style reduction on device.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from airslam_tpu.loopclosure.vocabulary import Vocabulary


class Database:
    def __init__(self, voc: Vocabulary):
        self.voc = voc
        self.inverted_file: Dict[int, Dict[int, List[int]]] = {}
        self.frame_bow: Dict[int, dict] = {}  # frame_id -> {word: weight}
        self.frame_words: Dict[int, np.ndarray] = {}  # frame_id -> per-feature word ids

    # -- FrameToBow (database.cc:58-91) -------------------------------------

    def frame_to_bow(self, desc: np.ndarray, mask: Optional[np.ndarray] = None):
        """Returns (bow_vector {word: weight}, word_of_features (N,),
        word_features {word: [indices]})."""
        vec, wids = self.voc.bow_vector(desc, mask)
        word_features: Dict[int, List[int]] = {}
        for i, wid in enumerate(wids):
            if wid >= 0 and (mask is None or mask[i]):
                word_features.setdefault(int(wid), []).append(i)
        return vec, wids, word_features

    # -- AddFrame ------------------------------------------------------------

    def add_frame(self, frame_id: int, desc: np.ndarray, mask=None):
        vec, wids, word_features = self.frame_to_bow(desc, mask)
        self.add_frame_bow(frame_id, vec, wids, word_features)
        return vec, wids

    def add_frame_bow(self, frame_id: int, vec: dict, wids, word_features: dict):
        self.frame_bow[frame_id] = vec
        self.frame_words[frame_id] = np.asarray(wids)
        for wid, idxs in word_features.items():
            self.inverted_file.setdefault(wid, {})[frame_id] = list(idxs)

    # -- Query (database.cc:111-123) -----------------------------------------

    def query(self, vec: dict) -> Dict[int, int]:
        """Shared-word counts per stored frame."""
        counts: Dict[int, int] = {}
        for wid in vec:
            for fid in self.inverted_file.get(wid, {}):
                counts[fid] = counts.get(fid, 0) + 1
        return counts

    def score(self, v1: dict, v2: dict) -> float:
        return Vocabulary.score_l1(v1, v2)

    def batched_scores(self, vec: dict, frame_ids: List[int]) -> np.ndarray:
        """L1 scores of a query against many frames as one dense reduction."""
        if not frame_ids:
            return np.zeros(0, np.float32)
        q = self.voc.dense_vector(vec)
        m = np.stack([self.voc.dense_vector(self.frame_bow[f]) for f in frame_ids])
        # Σ (|a|+|b|−|a−b|) / 2 over words
        s = 0.5 * (np.abs(q[None]) + np.abs(m) - np.abs(q[None] - m)).sum(axis=1)
        # subtract the non-common-word contribution (zero since min(a,0)=0)
        return s.astype(np.float32)

    # -- persistence ---------------------------------------------------------

    def state_dict(self) -> dict:
        return dict(
            inverted_file=self.inverted_file,
            frame_bow=self.frame_bow,
            frame_words={k: np.asarray(v) for k, v in self.frame_words.items()},
        )

    def load_state_dict(self, d: dict):
        self.inverted_file = d["inverted_file"]
        self.frame_bow = d["frame_bow"]
        self.frame_words = d["frame_words"]
