"""Knowledge-graph embedding models — Graph4KG capability
(reference: ``apps/Graph4KG``: score functions in ``models/score_funcs.py``,
training loop ``train.py:34-120``, negative sampling modes full/batch/chunk,
filtered MRR/Hits@k evaluation).

TPU-native design: entities/relations are dense jax arrays (shard the entity
table with ``pgl_tpu.parallel.ShardedEmbedding`` or back it with the mmap
``SharedEmbedding`` for >HBM tables); scoring is fully batched — negative
scores are computed against candidate *matrices* on the MXU rather than
per-sample loops.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["TransEScore", "DistMultScore", "ComplExScore", "RotatEScore",
           "QuatEScore", "OTEScore", "KGEModel", "filtered_ranks",
           "sample_negatives", "sharded_kg_params", "mrr_hits"]


class ScoreFunc:
    """score(h, r, t) — higher is better. ``neg_score`` scores each positive
    (h, r) against a [K, d] candidate tail matrix (or heads when
    ``neg_head``)."""

    def __call__(self, head, rel, tail):
        raise NotImplementedError

    def neg_score(self, head, rel, tail, candidates, neg_head: bool = False):
        if neg_head:
            return jax.vmap(
                lambda r, t: self(candidates, r[None], t[None]))(
                    rel, tail)
        return jax.vmap(
            lambda h, r: self(h[None], r[None], candidates))(head, rel)


class TransEScore(ScoreFunc):
    """γ - ||h + r - t||_p (Bordes et al., 2013)."""

    def __init__(self, gamma: float = 12.0, p: int = 1):
        self.gamma = gamma
        self.p = p

    def __call__(self, head, rel, tail):
        diff = head + rel - tail
        if self.p == 1:
            dist = jnp.abs(diff).sum(-1)
        else:
            dist = jnp.sqrt((diff * diff).sum(-1) + 1e-12)
        return self.gamma - dist


class DistMultScore(ScoreFunc):
    """Σ h∘r∘t (Yang et al., 2015)."""

    def __call__(self, head, rel, tail):
        return (head * rel * tail).sum(-1)

    def neg_score(self, head, rel, tail, candidates, neg_head: bool = False):
        # bilinear: one [B, d] x [d, K] matmul on the MXU instead of a
        # vmapped [B, K, d] elementwise reduce
        lhs = rel * (tail if neg_head else head)
        return lhs @ candidates.T


class ComplExScore(ScoreFunc):
    """Re(<h, r, conj(t)>) with interleaved complex halves
    (Trouillon et al., 2016)."""

    def __call__(self, head, rel, tail):
        hr, hi = jnp.split(head, 2, -1)
        rr, ri = jnp.split(rel, 2, -1)
        tr, ti = jnp.split(tail, 2, -1)
        return (hr * rr * tr + hi * rr * ti
                + hr * ri * ti - hi * ri * tr).sum(-1)

    def neg_score(self, head, rel, tail, candidates, neg_head: bool = False):
        # score is linear in the candidate side: fold (fixed, rel) into
        # per-half coefficients and run one MXU matmul against the raw
        # candidate matrix
        rr, ri = jnp.split(rel, 2, -1)
        if neg_head:
            tr, ti = jnp.split(tail, 2, -1)
            a = rr * tr + ri * ti          # coeff of candidate real half
            b = rr * ti - ri * tr          # coeff of candidate imag half
        else:
            hr, hi = jnp.split(head, 2, -1)
            a = hr * rr - hi * ri
            b = hi * rr + hr * ri
        return jnp.concatenate([a, b], -1) @ candidates.T


class RotatEScore(ScoreFunc):
    """γ - ||h ∘ e^{iθ_r} - t|| — relations as unit complex rotations
    (Sun et al., 2019). Relation embeddings hold the phases θ (dim d/2)."""

    def __init__(self, gamma: float = 12.0, embed_dim: int = 256,
                 epsilon: float = 2.0):
        self.gamma = gamma
        # phase scale as in the paper: (γ+ε)/d per dimension
        self.emb_init = (gamma + epsilon) / (embed_dim // 2)

    def __call__(self, head, rel, tail):
        hr, hi = jnp.split(head, 2, -1)
        tr, ti = jnp.split(tail, 2, -1)
        phase = rel / (self.emb_init / np.pi)
        rr, ri = jnp.cos(phase), jnp.sin(phase)
        dr = hr * rr - hi * ri - tr
        di = hr * ri + hi * rr - ti
        dist = jnp.sqrt(dr * dr + di * di + 1e-12).sum(-1)
        return self.gamma - dist


class QuatEScore(ScoreFunc):
    """Quaternion rotations (Zhang et al., 2019): normalize r to unit
    quaternions, rotate h, inner-product with t."""

    def __call__(self, head, rel, tail):
        ha, hb, hc, hd = jnp.split(head, 4, -1)
        ra, rb, rc, rd = jnp.split(rel, 4, -1)
        ta, tb, tc, td = jnp.split(tail, 4, -1)
        norm = jnp.sqrt(ra**2 + rb**2 + rc**2 + rd**2 + 1e-12)
        ra, rb, rc, rd = ra / norm, rb / norm, rc / norm, rd / norm
        # Hamilton product h ⊗ r
        a = ha * ra - hb * rb - hc * rc - hd * rd
        b = ha * rb + hb * ra + hc * rd - hd * rc
        c = ha * rc - hb * rd + hc * ra + hd * rb
        d = ha * rd + hb * rc - hc * rb + hd * ra
        return (a * ta + b * tb + c * tc + d * td).sum(-1)


class OTEScore(ScoreFunc):
    """Orthogonal transform embedding (Tang et al., 2020): relation holds
    ``num_blocks`` square matrices, Gram–Schmidt-orthonormalized, applied
    blockwise to the head; score is γ - ||OTE(h, r) - t||."""

    def __init__(self, gamma: float = 12.0, num_blocks: int = 4):
        self.gamma = gamma
        self.num_blocks = num_blocks

    def _orthonormal(self, rel, sub):
        mats = rel.reshape(rel.shape[:-1] + (self.num_blocks, sub, sub))
        q, _ = jnp.linalg.qr(mats)
        return q

    def __call__(self, head, rel, tail):
        d = head.shape[-1]
        sub = d // self.num_blocks
        q = self._orthonormal(rel, sub)
        h = head.reshape(head.shape[:-1] + (self.num_blocks, sub))
        out = jnp.einsum("...bij,...bj->...bi", q, h)
        out = out.reshape(head.shape[:-1] + (d,))
        return self.gamma - jnp.abs(out - tail).sum(-1)


SCORE_FUNCS = {
    "transe": TransEScore,
    "distmult": DistMultScore,
    "complex": ComplExScore,
    "rotate": RotatEScore,
    "quate": QuatEScore,
    "ote": OTEScore,
}


class KGEModel:
    """Dense-array KG embedding trainer state + loss builder.

    Args:
      num_ents / num_rels / embed_dim: table shapes (relation dim may differ
        per score func: rotate uses d/2, ote uses num_blocks*sub^2 — pass
        ``rel_dim``).
      score: name in SCORE_FUNCS or a ScoreFunc instance.
      neg_mode: 'batch' (negatives drawn from in-batch entities) or 'full'
        (score against every entity) — reference modes, chunk == batch with
        chunk_size grouping.
      adversarial_temp: self-adversarial negative weighting (RotatE paper);
        0 disables.
    """

    def __init__(self, num_ents: int, num_rels: int, embed_dim: int,
                 score="transe", rel_dim: Optional[int] = None,
                 gamma: float = 12.0, adversarial_temp: float = 1.0,
                 seed: int = 0):
        if isinstance(score, str):
            cls = SCORE_FUNCS[score.lower()]
            if cls is TransEScore:
                self.score = cls(gamma)
            elif cls is RotatEScore:
                self.score = cls(gamma, embed_dim)
            elif cls is OTEScore:
                self.score = cls(gamma)
            else:
                self.score = cls()
            self._score_name = score.lower()
        else:
            self.score = score
            # 'RotatEScore' -> 'rotate', so rel_dim/init logic applies to
            # instances the same as to string names
            name = type(score).__name__.lower()
            self._score_name = name[:-5] if name.endswith("score") else name
        self.num_ents = num_ents
        self.num_rels = num_rels
        self.embed_dim = embed_dim
        rel_dim = rel_dim or {
            "rotate": embed_dim // 2}.get(self._score_name, embed_dim)
        rng = np.random.default_rng(seed)
        # RotatE's embedding range is (γ+ε)/complex_dim — the score maps
        # phases by the SAME constant, so a /embed_dim init would confine
        # rotations to half the phase space
        if self._score_name == "rotate":
            scale = (gamma + 2.0) / (embed_dim // 2)
        else:
            scale = (gamma + 2.0) / embed_dim
        self.params = {
            "ent": jnp.asarray(rng.uniform(
                -scale, scale, (num_ents, embed_dim)).astype(np.float32)),
            "rel": jnp.asarray(rng.uniform(
                -scale, scale, (num_rels, rel_dim)).astype(np.float32)),
        }
        self.adversarial_temp = adversarial_temp

    def loss_fn(self, params, h, r, t, neg_ents, neg_head: bool = False):
        """Logsigmoid loss with self-adversarial negative weighting.

        ``neg_ents`` encodes the reference's three negative modes
        (``/root/reference/apps/Graph4KG/dataset/dataset.py:115-131``):

        * ``[K]``    — one candidate pool shared by the whole batch
          (in-batch sharing; our original mode).
        * ``[C, K]`` — ``C`` chunks (``C`` divides B) each sharing a pool
          ('chunk' mode; with ``C == B`` this is per-triplet negatives,
          i.e. the 'batch'/'full' modes after sampling).
        """
        ent, rel = params["ent"], params["rel"]
        he, re_, te = ent[h], rel[r], ent[t]
        pos = self.score(he, re_, te)
        if neg_ents.ndim == 2:
            C = neg_ents.shape[0]
            cand = ent[neg_ents]                   # [C, K, d]

            def one_chunk(hc, rc, tc, cc):
                return self.score.neg_score(hc, rc, tc, cc, neg_head)

            B = he.shape[0]
            neg = jax.vmap(one_chunk)(
                he.reshape((C, B // C) + he.shape[1:]),
                re_.reshape((C, B // C) + re_.shape[1:]),
                te.reshape((C, B // C) + te.shape[1:]),
                cand).reshape(B, -1)               # [B, K]
        else:
            cand = ent[neg_ents]                   # [K, d]
            neg = self.score.neg_score(he, re_, te, cand, neg_head)
        pos_loss = -jax.nn.log_sigmoid(pos).mean()
        if self.adversarial_temp > 0:
            w = jax.nn.softmax(
                jax.lax.stop_gradient(neg) * self.adversarial_temp, axis=-1)
            neg_loss = -(w * jax.nn.log_sigmoid(-neg)).sum(-1).mean()
        else:
            neg_loss = -jax.nn.log_sigmoid(-neg).mean()
        return (pos_loss + neg_loss) / 2

    def predict_all_tails(self, params, h, r):
        """[B, num_ents] scores for ranking evaluation (sharding pad rows
        from :func:`sharded_kg_params` are excluded)."""
        ent, rel = params["ent"], params["rel"]
        return self.score.neg_score(ent[h], rel[r], None,
                                    ent[:self.num_ents], neg_head=False)


def sample_negatives(h, t, num_ents: int, mode: str, neg_size: int,
                     rng, num_chunks: int = 1):
    """Draw negative entity ids per the reference's three modes
    (``/root/reference/apps/Graph4KG/dataset/dataset.py:115-131``):

    * ``'batch'`` — per-triplet negatives drawn from the batch's own
      entities → ``[B, neg_size]``.
    * ``'full'``  — per-triplet negatives drawn uniformly from all
      entities → ``[B, neg_size]``.
    * ``'chunk'`` — the batch splits into ``num_chunks`` groups, each
      sharing ``max(B, neg_size) // num_chunks`` negatives drawn from all
      entities → ``[num_chunks, K]``.
    """
    h = np.asarray(h)
    t = np.asarray(t)
    B = len(h)
    if mode == "batch":
        pool = np.unique(np.concatenate([h, t]))
        return pool[rng.integers(0, len(pool), (B, neg_size))]
    if mode == "full":
        return rng.integers(0, num_ents, (B, neg_size))
    if mode == "chunk":
        k = max(B, neg_size) // max(num_chunks, 1)
        return rng.integers(0, num_ents, (num_chunks, k))
    raise ValueError(f"neg_sample_type {mode!r} not supported "
                     "(batch/full/chunk)")


def sharded_kg_params(model: "KGEModel", mesh, axis: str = "data"):
    """Place the entity table row-sharded over ``mesh[axis]`` and the
    (small) relation table replicated — the TPU-native analog of the
    reference's multi-GPU ``dist_train`` path
    (``/root/reference/apps/Graph4KG/train.py:34-120``, NCCL allreduce +
    sharded ent embeddings): under jit, GSPMD turns the id gathers into
    all-to-alls over ICI and the scatter-add gradient update stays local
    to each shard."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    n = mesh.shape[axis]
    ent = model.params["ent"]
    pad = (-ent.shape[0]) % n
    if pad:
        ent = jnp.concatenate(
            [ent, jnp.zeros((pad, ent.shape[1]), ent.dtype)])
    return {
        "ent": jax.device_put(ent, NamedSharding(mesh, P(axis, None))),
        "rel": jax.device_put(model.params["rel"],
                              NamedSharding(mesh, P())),
    }


def filtered_ranks(scores, true_idx, filter_mask=None):
    """Ranks of the true entities under optional filtering.

    ``scores`` [B, N] (higher better), ``true_idx`` [B];
    ``filter_mask`` [B, N] True at known-positive entries to exclude
    (the true entry is always kept).
    """
    scores = jnp.asarray(scores)
    B = scores.shape[0]
    true_scores = scores[jnp.arange(B), true_idx]
    if filter_mask is not None:
        keep_true = jax.nn.one_hot(true_idx, scores.shape[1], dtype=bool)
        scores = jnp.where(filter_mask & ~keep_true, -jnp.inf, scores)
    ranks = (scores > true_scores[:, None]).sum(-1) + 1
    return ranks


def mrr_hits(ranks, ks=(1, 3, 10)) -> Dict[str, float]:
    ranks = np.asarray(ranks, dtype=np.float64)
    out = {"mrr": float((1.0 / ranks).mean())}
    for k in ks:
        out[f"hits@{k}"] = float((ranks <= k).mean())
    return out
