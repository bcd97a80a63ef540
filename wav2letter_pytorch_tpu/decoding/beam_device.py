"""On-device (TPU) vectorized CTC prefix beam search.

The reference's beam search (/root/reference/decoder.py:147-233, replicated
host-side in decoder.prefix_beam_search) is a string-keyed DP — inherently
serial per utterance. This module runs the SAME dynamic program as a batched
jit program: beam state lives in fixed-shape tensors, prefix identity is a
pair of 32-bit rolling hashes, and the decoded strings are reconstructed on
host from per-step backpointers (FlexCTC-style; see PAPERS.md). All of the
reference's probability bookkeeping is preserved exactly, in log space:

* per-prefix blank/non-blank mass split (``p_b`` / ``p_nb``);
* per-step candidate pruning (``step[c] > prune``, including the blank);
* repeat-character split (extend from blank-paths only; same-char
  continuation stays on the shorter prefix);
* the "discarded prefixes" re-merge — an extension that is not in the
  current beam list recovers the mass its prefix still holds in the
  PREVIOUS step's candidate pool (reference decoder.py:233-237), so the
  pool (k·V slots), not just the k beams, is carried between steps;
* word-count length bonus ``(num_words + 1) ** beta`` in beam ranking,
  where a word "counts" once completed by a separator (_WORD_RE semantics).

LM fusion comes in two flavors:

* ``beam_search_device_lm`` — EXACT in-loop fusion (reference
  decoder.py:227-230): the step program takes a per-pool-slot additive
  log-bonus ``alpha * ln(lm(prefix))`` that it applies to space-extension
  contributions, and a host loop drives one compiled step per frame while
  maintaining the pool's prefix strings and (memoized) LM scores between
  steps. The device does all the DP math over the batch; the host does
  only string bookkeeping and LM lookups — exactly the split the
  string-keyed LM forces. Cross-checked string-exact against the host DP.
* n-best host rescoring (``DeviceBeamDecoder(lm_mode='rescore')``) — the
  single-dispatch approximation: LM-free scan search, then
  ``rank + alpha*ln10*lm.score(text)`` over the n-best list. Faster when
  per-step host round-trips are expensive (e.g. a remote device tunnel).

Hotword biasing (``hotwords=``) rides the same per-frame host loop as the
exact LM fusion: the host keeps a per-slot-per-char log-delta table from
each slot's HotwordTrie state (``ln trie.extend`` per char,
``ln trie.complete`` on the space column, memoized per in-progress word)
and the compiled step adds it to every extension contribution — identical
math to the host DP's partial-credit scheme (decoder.py::HotwordTrie),
composable with the fused LM. Cross-checked string-exact vs the host DP.

Scan carry is O(k·V) scalars per sample (hashes, masses, word counts) —
no prefix arrays on device; per-step outputs are (parent, char)
backpointers, walked backwards on host to materialize the top string.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30
# Two independent multiplicative rolling hashes; matches are additionally
# gated on liveness, and both 32-bit hashes must agree, so the collision
# probability over a search is ~(pairs compared) / 2^64 — negligible.
_H1_MULT = np.uint32(0x9E3779B1)
_H2_MULT = np.uint32(0x85EBCA77)


def _log(x):
    return float(np.log(x)) if x > 0 else -np.inf


def _masks(labels):
    sep_mask = tuple(int(ch in ' |>') for ch in labels)
    word_mask = tuple(int(ch.isalnum() or ch == '_') for ch in labels)
    return sep_mask, word_mask


def _pool_init(P):
    pb = jnp.full((P,), NEG_INF).at[0].set(0.0)  # '' with p_b = 1
    pnb = jnp.full((P,), NEG_INF)
    h1 = jnp.zeros((P,), jnp.uint32).at[0].set(np.uint32(1))
    h2 = jnp.zeros((P,), jnp.uint32).at[0].set(np.uint32(1))
    wc = jnp.zeros((P,), jnp.int32)
    lastc = jnp.full((P,), -1, jnp.int32)
    alive = jnp.zeros((P,), bool).at[0].set(True)
    has_char = jnp.zeros((P,), bool)  # prefix has any non-space char
    return pb, pnb, h1, h2, wc, lastc, alive, has_char


def _mask_tail_steps(lp, lengths, blank):
    """Steps past a sample's length must be identity on the beam state: a
    deterministic blank (log-prob 0) only moves p_nb mass into p_b,
    leaving every prefix's total and the ranking unchanged."""
    T, V = lp.shape[-2], lp.shape[-1]
    blank_row = jnp.full((V,), NEG_INF).at[blank].set(0.0)
    t_ix = jnp.arange(T)
    return jnp.where((t_ix[None, :, None] < lengths[:, None, None]),
                     lp, blank_row[None, None, :])


def _make_step(k, blank, beta, log_prune, sep_mask, word_mask,
               space_ix: int, use_lm: bool, use_hw: bool = False):
    """Build the per-sample DP step:
    (carry, lp_t [V], lm_add [P], hw_add [P, V-1]) ->
    (carry, (parent [P], char [P])).

    ``lm_add[slot]`` = alpha*ln(lm(prefix_of_slot stripped)) — applied to
    non-repeat SPACE extensions of prefixes that contain a word character,
    exactly where the host DP multiplies ``lm(l_plus)**alpha``
    (decoder.py:227-230; the re-merge terms stay LM-free, matching
    decoder.py:233-237). Ignored when ``use_lm`` is False.

    ``hw_add[slot, j]`` = hotword partial-credit log-delta for extending
    the slot's prefix with non-blank char ``cs[j]`` (``ln trie.extend`` for
    ordinary chars, ``ln trie.complete`` for the space) — applied to EVERY
    extension contribution (repeat and non-repeat alike), exactly where the
    host DP multiplies ``w_h``; the continuation/re-merge terms stay
    unweighted, matching the host bookkeeping. Ignored when ``use_hw`` is
    False.
    """
    V = len(sep_mask)
    sep = jnp.asarray(sep_mask, jnp.bool_)
    word = jnp.asarray(word_mask, jnp.bool_)
    cs = jnp.asarray([c for c in range(V) if c != blank])
    P = k * V

    def step(carry, lp_t, lm_add, hw_add):
        pb, pnb, h1, h2, wc, lastc, alive, has_char = carry
        score = jnp.logaddexp(pb, pnb)
        rank = jnp.where(alive,
                         score + beta * jnp.log(wc.astype(jnp.float32)
                                                + 1.0),
                         NEG_INF)
        _, bidx = jax.lax.top_k(rank, k)
        bpb, bpnb = pb[bidx], pnb[bidx]
        bh1, bh2 = h1[bidx], h2[bidx]
        bwc, blast = wc[bidx], lastc[bidx]
        balive = alive[bidx]
        bhas = has_char[bidx]
        prev_total = jnp.logaddexp(bpb, bpnb)

        lpb = lp_t[blank]
        blank_ok = lpb > log_prune

        # ---- keep slots: the beam's own prefix at step t -----------
        keep_pb = jnp.where(balive & blank_ok, lpb + prev_total, NEG_INF)
        rep_lp = lp_t[jnp.clip(blast, 0)]
        rep_ok = balive & (blast >= 0) & (rep_lp > log_prune)
        keep_pnb = jnp.where(rep_ok, rep_lp + bpnb, NEG_INF)

        # ---- extension slots: beam i extended with char c ----------
        lc = lp_t[cs]                                     # [V-1]
        active = lc > log_prune
        is_rep = cs[None, :] == blast[:, None]            # [k, V-1]
        base = jnp.where(is_rep, bpb[:, None],
                         prev_total[:, None]) + lc[None, :]
        if use_hw:
            # Hotword partial credit: weights every extension contribution
            # (host DP's w_h at decoder.py repeat/else branches and the
            # trie.complete factor folded into the space column host-side).
            base = base + hw_add[bidx]
        if use_lm:
            # Word boundary: non-repeat space extension of a prefix with
            # word content gets the in-loop LM weight (multiplies the
            # whole contribution, including its in-beams merge below).
            fuse = (~is_rep) & bhas[:, None] & (cs == space_ix)[None, :]
            base = base + jnp.where(fuse, lm_add[bidx][:, None], 0.0)
        ext_alive = balive[:, None] & active[None, :]
        contrib = jnp.where(ext_alive, base, NEG_INF)
        eh1 = bh1[:, None] * _H1_MULT + (cs[None, :] + 1).astype(
            jnp.uint32)
        eh2 = bh2[:, None] * _H2_MULT + (cs[None, :] + 1).astype(
            jnp.uint32)

        # extension == an existing beam? (reference: `extended in
        # beams`) -> its mass goes to that beam's keep slot instead.
        m_keep = ((eh1[:, :, None] == bh1[None, None, :]) &
                  (eh2[:, :, None] == bh2[None, None, :]) &
                  balive[None, None, :] & ext_alive[:, :, None])
        in_beams = m_keep.any(-1)
        inc = jax.nn.logsumexp(
            jnp.where(m_keep, contrib[:, :, None], NEG_INF), axis=(0, 1))
        keep_pnb = jnp.logaddexp(keep_pnb, inc)

        # re-merge vs the full previous pool (discarded prefixes).
        m_pool = ((eh1[:, :, None] == h1[None, None, :]) &
                  (eh2[:, :, None] == h2[None, None, :]) &
                  alive[None, None, :] & ext_alive[:, :, None] &
                  ~in_beams[:, :, None])
        prev_pb_m = jax.nn.logsumexp(
            jnp.where(m_pool, pb[None, None, :], NEG_INF), axis=-1)
        prev_pnb_m = jax.nn.logsumexp(
            jnp.where(m_pool, pnb[None, None, :], NEG_INF), axis=-1)
        dead_ext = in_beams | ~ext_alive
        ext_pb = jnp.where(dead_ext, NEG_INF,
                           lpb + jnp.logaddexp(prev_pb_m, prev_pnb_m))
        ext_pnb = jnp.where(dead_ext, NEG_INF,
                            jnp.logaddexp(contrib,
                                          lc[None, :] + prev_pnb_m))

        # word bookkeeping: a separator right after a word char
        # completes a word (reference _WORD_RE = \w+[\s|>]).
        last_is_word = (blast >= 0) & word[jnp.clip(blast, 0)]
        ext_wc = bwc[:, None] + (sep[cs][None, :] &
                                 last_is_word[:, None]).astype(jnp.int32)
        ext_lastc = jnp.broadcast_to(cs[None, :], (k, V - 1))
        ext_has = bhas[:, None] | (cs != space_ix)[None, :]

        flat = lambda a: a.reshape(k * (V - 1))
        new = (
            jnp.concatenate([keep_pb, flat(ext_pb)]),
            jnp.concatenate([keep_pnb, flat(ext_pnb)]),
            jnp.concatenate([bh1, flat(eh1)]),
            jnp.concatenate([bh2, flat(eh2)]),
            jnp.concatenate([bwc, flat(ext_wc)]),
            jnp.concatenate([blast, flat(ext_lastc)]),
            jnp.concatenate([balive, flat(~dead_ext)]),
            jnp.concatenate([bhas, flat(ext_has)]),
        )
        parent = jnp.concatenate(
            [bidx, jnp.repeat(bidx, V - 1)]).astype(jnp.int32)
        char = jnp.concatenate(
            [jnp.full((k,), -1, jnp.int32),
             flat(jnp.broadcast_to(cs[None, :], (k, V - 1))).astype(
                 jnp.int32)])
        return new, (parent, char)

    return step, P


@lru_cache(maxsize=32)
def _jitted_lm_step(k, blank, beta, log_prune, sep_mask, word_mask,
                    space_ix, use_lm=True, use_hw=False):
    """Compiled batched LM/hotword-fused DP step, cached across calls by
    its static configuration (all-hashable args)."""
    step, P = _make_step(k, blank, beta, log_prune, sep_mask, word_mask,
                         space_ix, use_lm=use_lm, use_hw=use_hw)
    return jax.jit(jax.vmap(step), donate_argnums=(0,)), P


@lru_cache(maxsize=32)
def _jitted_final_rank(beta, k):
    return jax.jit(jax.vmap(partial(_final_rank, beta=beta, k=k)))


def _final_rank(carry, beta, k):
    pb, pnb, _, _, wc, _, alive, _ = carry
    score = jnp.logaddexp(pb, pnb)
    rank = jnp.where(alive,
                     score + beta * jnp.log(wc.astype(jnp.float32) + 1.0),
                     NEG_INF)
    _, top_idx = jax.lax.top_k(rank, k)
    return top_idx, rank[top_idx], score[top_idx]


@partial(jax.jit, static_argnames=('k', 'blank', 'beta', 'log_prune',
                                   'sep_mask', 'word_mask'))
def _search(lp, lengths, *, k, blank, beta, log_prune, sep_mask, word_mask):
    """lp: [B, T, V] log-probabilities. Returns per-sample backpointer
    tables + final pool state for host-side backtrace (LM-free scan)."""
    step, P = _make_step(k, blank, beta, log_prune, sep_mask, word_mask,
                         space_ix=-1, use_lm=False)
    lp = _mask_tail_steps(lp, lengths, blank)
    dummy = jnp.zeros((P,), jnp.float32)
    dummy_hw = jnp.zeros((1, 1), jnp.float32)

    def single(lp_s):
        carry, (parents, chars) = jax.lax.scan(
            lambda c, x: step(c, x, dummy, dummy_hw), _pool_init(P), lp_s)
        top_idx, ranks, scores = _final_rank(carry, beta, k)
        return parents, chars, top_idx, ranks, scores

    return jax.vmap(single)(lp)


def _backtrace(parents, chars, slot):
    """Walk (parent, char) tables backwards from ``slot`` at the last step."""
    out = []
    s = int(slot)
    for t in range(parents.shape[0] - 1, -1, -1):
        c = int(chars[t, s])
        if c >= 0:
            out.append(c)
        s = int(parents[t, s])
    out.reverse()
    return out


def beam_search_device(log_probs, lengths, labels, k: int = 5,
                       beta: float = 5.0, prune: float = 1e-3,
                       blank_index: int = 0, n_best: int = 1):
    """Batched CTC prefix beam search on the accelerator (LM-free).

    Args:
        log_probs: [B, T, V] log-probabilities (natural log).
        lengths: [B] valid frame counts.
        labels: label list aligned with V (blank at ``blank_index``).
        n_best: how many hypotheses to materialize per sample.
    Returns:
        list (len B) of lists of (ids, log_score, log_rank) tuples, best
        first; ``ids`` is the decoded label-id sequence.
    """
    labels = list(labels)
    if '>' in labels:
        raise ValueError("device beam search does not support an end_char "
                         "('>') label; use the host search")
    sep_mask, word_mask = _masks(labels)
    lp = jnp.asarray(log_probs, jnp.float32)
    lengths = jnp.asarray(lengths, jnp.int32)
    parents, chars, top_idx, ranks, scores = _search(
        lp, lengths, k=int(k), blank=int(blank_index), beta=float(beta),
        log_prune=_log(prune), sep_mask=sep_mask, word_mask=word_mask)
    parents = np.asarray(parents)
    chars = np.asarray(chars)
    top_idx = np.asarray(top_idx)
    ranks = np.asarray(ranks)
    scores = np.asarray(scores)
    results = []
    for b in range(lp.shape[0]):
        hyps = []
        for j in range(min(n_best, top_idx.shape[1])):
            ids = _backtrace(parents[b], chars[b], top_idx[b, j])
            hyps.append((ids, float(scores[b, j]), float(ranks[b, j])))
        results.append(hyps)
    return results


def beam_search_device_lm(log_probs, lengths, labels, lm=None, k: int = 5,
                          alpha: float = 0.3, beta: float = 5.0,
                          prune: float = 1e-3, blank_index: int = 0,
                          hotwords=None, hotword_weight: float = 2.0):
    """EXACT in-loop LM and/or hotword fusion on device (reference
    decoder.py:227-230; hotwords: decoding.HotwordTrie partial credit).

    A host loop dispatches one compiled batched DP step per frame; between
    steps the host advances the pool's prefix strings from the returned
    (parent, char) tables and refreshes (a) the per-slot LM bonus
    ``alpha * ln(lm(prefix.strip(' ')))`` the NEXT step applies to its
    space extensions and (b) the per-slot-per-char hotword log-delta table
    (``ln trie.extend`` per char, ``ln trie.complete`` on the space column)
    the next step applies to every extension — both memoized. Device does
    all the mass bookkeeping; host does only strings + LM/trie lookups —
    the split the string-keyed scorers force. Math is identical to the
    host ``prefix_beam_search`` with the same ``lm``/``hotwords``.

    ``lm``: callable str -> probability (the host DP contract), or None.
    Returns: list (len B) of decoded strings.
    """
    labels = list(labels)
    if '>' in labels:
        raise ValueError("device beam search does not support an end_char "
                         "('>') label; use the host search")
    sep_mask, word_mask = _masks(labels)
    space_ix = labels.index(' ') if ' ' in labels else -1
    k = int(k)
    use_lm = lm is not None
    trie = None
    if hotwords is not None:
        from .decoder import HotwordTrie
        trie = hotwords if isinstance(hotwords, HotwordTrie) \
            else HotwordTrie(hotwords, hotword_weight)
    # Memoized: a fresh jax.jit(closure) here would recompile the step
    # program on every call (jit caches by function identity), turning
    # repeated-batch eval into one full compile per batch.
    step_b, P = _jitted_lm_step(k, int(blank_index), float(beta),
                                _log(prune), sep_mask, word_mask, space_ix,
                                use_lm=use_lm, use_hw=trie is not None)

    lp = jnp.asarray(log_probs, jnp.float32)
    lengths = jnp.asarray(lengths, jnp.int32)
    B, T, V = lp.shape
    lp = jax.device_put(_mask_tail_steps(lp, lengths, int(blank_index)))
    carry = jax.vmap(lambda _: _pool_init(P))(jnp.arange(B))

    # Host-side pool mirrors: prefix string per slot (only live slots are
    # meaningful) and the memoized LM-bonus / hotword-delta tables.
    strings = [[''] * P for _ in range(B)]
    lm_add_h = np.zeros((B, P), np.float32)
    memo: dict = {}
    ln = np.log

    def bonus(s: str) -> float:
        hit = memo.get(s)
        if hit is None:
            p = lm(s)
            hit = float(alpha * ln(p)) if p > 0 else NEG_INF
            memo[s] = hit
        return hit

    if trie is not None:
        # Hotword delta rows, memoized per in-progress-word partial (the
        # delta only depends on the post-last-space chars of the prefix).
        # Built from the SAME HotwordTrie methods the host DP multiplies
        # (decoder.py extend()/complete()) so the backends cannot drift.
        cs_host = [c for c in range(V) if c != blank_index]
        hw_add_h = np.zeros((B, P, V - 1), np.float32)
        hw_memo: dict = {}

        def hw_row(partial: str):
            row = hw_memo.get(partial)
            if row is None:
                row = np.asarray(
                    [ln(trie.complete(partial)) if labels[ci] == ' '
                     else ln(trie.extend(partial, labels[ci]))
                     for ci in cs_host], np.float32)
                hw_memo[partial] = row
            return row

        # The root prefix '' is live before the first frame: its
        # extensions already earn first-character credit (host DP applies
        # trie.extend('', c) at t=1).
        hw_add_h[:, 0, :] = hw_row('')
    dummy_hw = jnp.zeros((B, 1, 1), jnp.float32)
    for t in range(T):
        carry, (parent, char) = step_b(
            carry, lp[:, t], jnp.asarray(lm_add_h),
            jnp.asarray(hw_add_h) if trie is not None else dummy_hw)
        parent_h = np.asarray(parent)
        char_h = np.asarray(char)
        alive_h = np.asarray(carry[6])
        for b in range(B):
            prev = strings[b]
            row = parent_h[b]
            crow = char_h[b]
            arow = alive_h[b]
            new = [''] * P
            for s in range(P):
                if not arow[s]:
                    continue
                c = crow[s]
                new[s] = prev[row[s]] if c < 0 else prev[row[s]] + labels[c]
            strings[b] = new
            if use_lm:
                # Next step's LM bonus: the boundary factor is
                # lm((prefix + ' ').strip(' ')) == lm(prefix.strip(' ')).
                add = lm_add_h[b]
                for s in range(P):
                    if arow[s] and new[s].replace(' ', ''):
                        add[s] = bonus(new[s].strip(' '))
                    else:
                        add[s] = 0.0
            if trie is not None:
                hadd = hw_add_h[b]
                for s in range(P):
                    if arow[s]:
                        hadd[s] = hw_row(new[s].rsplit(' ', 1)[-1])

    top_idx, _, _ = _jitted_final_rank(float(beta), k)(carry)
    top_idx = np.asarray(top_idx)
    return [strings[b][int(top_idx[b, 0])] for b in range(B)]


class DeviceBeamDecoder:
    """Decoder-API wrapper over the on-device batched beam search.

    Drop-in alternative to PrefixBeamSearchLMDecoder for eval on
    accelerator-resident batches: the whole batch is searched in jit
    programs instead of one serial host search per utterance. With an LM,
    ``lm_mode='fused'`` (default) runs the EXACT in-loop word-boundary
    fusion (one compiled step per frame, host-maintained prefix strings —
    see ``beam_search_device_lm``); ``lm_mode='rescore'`` runs the
    single-dispatch LM-free search and host-rescores the n-best list
    (``rank + alpha*ln10*lm.score(text)``) — an approximation that avoids
    per-step host round-trips (cheaper over a remote device tunnel).
    """

    def __init__(self, labels, blank_index: int = 0, k: int = None,
                 alpha: float = None, beta: float = None, prune: float = None,
                 lm_path: str = '', n_best: int = 8,
                 lm_mode: str = 'fused', hotwords=None,
                 hotword_weight: float = 2.0):
        from .decoder import (DEFAULT_BEAM_ALPHA, DEFAULT_BEAM_BETA,
                              DEFAULT_BEAM_K, DEFAULT_BEAM_PRUNE, Decoder,
                              HotwordTrie)
        # Defaults follow the corpus-sweep winners (DEFAULT_BEAM_*).
        k = DEFAULT_BEAM_K if k is None else k
        alpha = DEFAULT_BEAM_ALPHA if alpha is None else alpha
        beta = DEFAULT_BEAM_BETA if beta is None else beta
        prune = DEFAULT_BEAM_PRUNE if prune is None else prune
        self._base = Decoder(list(labels), blank_index)
        self.labels = self._base.labels
        self.blank_index = blank_index
        self.k, self.alpha, self.beta, self.prune = k, alpha, beta, prune
        self.n_best = n_best
        if lm_mode not in ('fused', 'rescore'):
            raise ValueError(f'unknown lm_mode: {lm_mode!r}')
        self.lm_mode = lm_mode
        self._lm = None
        if lm_path:
            from .arpa_lm import load_lm
            self._lm = load_lm(lm_path)
        self.trie = None
        if hotwords is not None:
            if lm_mode == 'rescore':
                raise ValueError(
                    'hotword biasing needs in-loop fusion: use '
                    "lm_mode='fused' (n-best rescoring cannot recover "
                    'hypotheses the unbiased search pruned)')
            self.trie = hotwords if isinstance(hotwords, HotwordTrie) \
                else HotwordTrie(hotwords, hotword_weight)

    # WER/CER surface (delegate to the shared Decoder math)
    def wer(self, *a, **k):
        return self._base.wer(*a, **k)

    def cer(self, *a, **k):
        return self._base.cer(*a, **k)

    def wer_ratio(self, *a, **k):
        return self._base.wer_ratio(*a, **k)

    def cer_ratio(self, *a, **k):
        return self._base.cer_ratio(*a, **k)

    def decode(self, probs, sizes=None, return_offsets: bool = False):
        """probs: [B, T, V] or [T, V] label PROBABILITIES (reference
        decoder contract). Returns decoded strings (a single string for
        2-D input); with ``return_offsets``, also per-char frame offsets
        from forced alignment of each hypothesis (decoder._beam_offsets).
        """
        probs = np.asarray(probs)
        squeeze = probs.ndim == 2
        if squeeze:
            probs = probs[None]
        B, T, _ = probs.shape
        sizes = np.full((B,), T, np.int32) if sizes is None \
            else np.asarray(sizes, np.int32)
        lp = np.log(np.clip(probs, 1e-30, None))
        if (self._lm is not None and self.lm_mode == 'fused') \
                or self.trie is not None:
            lm_prob = None if self._lm is None \
                else (lambda s: 10.0 ** self._lm.score(s))
            out = beam_search_device_lm(lp, sizes, self.labels, lm_prob,
                                        k=self.k, alpha=self.alpha,
                                        beta=self.beta, prune=self.prune,
                                        blank_index=self.blank_index,
                                        hotwords=self.trie)
        else:
            n_best = self.n_best if self._lm is not None else 1
            results = beam_search_device(lp, sizes, self.labels, k=self.k,
                                         beta=self.beta, prune=self.prune,
                                         blank_index=self.blank_index,
                                         n_best=n_best)
            out = []
            for hyps in results:
                if self._lm is None:
                    best = hyps[0][0]
                else:
                    ln10 = float(np.log(10.0))

                    def rescored(h):
                        ids, _, log_rank = h
                        text = ''.join(self.labels[i] for i in ids).strip()
                        return log_rank + self.alpha * ln10 * \
                            self._lm.score(text)
                    best = max(hyps, key=rescored)[0]
                out.append(''.join(self.labels[i] for i in best))
        if return_offsets:
            from .decoder import _beam_offsets
            offs = [_beam_offsets(probs[b, :sizes[b]], out[b], self.labels,
                                  self.blank_index) for b in range(B)]
            if squeeze:
                return out[0], offs[0]
            return out, offs
        return out[0] if squeeze else out
