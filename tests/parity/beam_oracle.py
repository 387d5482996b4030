"""Resurrect the reference CoCa beam search as a test oracle.

The reference guards generation behind `from transformers import
BeamSearchScorer, ...` (coca_model.py:17-35); transformers 4.57 removed those
top-level exports, so `_has_transformers` is False and the reference's own
beam search is DEAD on this environment.  Worse, the reference reads scorer
internals — `batch_size = len(beam_scorer._beam_hyps)`
(coca_model.py:322) — which pins it to the transformers 4.26–4.30 vintage
where `_beam_hyps` had one pool of capacity `num_beams` PER BATCH (the
modern scorer keeps `batch_size * num_beam_groups` pools of capacity
`group_size`, making the reference raise "Batch dimension of `input_ids`
should be 36" for batch 2 / 6 beams).

`OldBeamSearchScorer` below reimplements that vintage's semantics exactly
(per-batch pools, `cur_len = len + 1` in process, `add()` dividing by the
PREFIX length, per-batch `_done`, finalize adding all open beams), and
`arm_reference_beamsearch` injects it plus the still-importable logits
processors and a scalar-bool StoppingCriteriaList (the old calling
convention `if ... or stopping_criteria(...)` needs a python bool) into a
loaded reference module.  This gives a live golden oracle for
`daclip_tpu.models.coca.generate_beam`.
"""
from __future__ import annotations


class _BeamHyps:
    """transformers 4.26-4.30 BeamHypotheses (length_penalty=1, no early
    stopping): score = sum_logprobs / len(hyp)."""

    def __init__(self, num_beams: int):
        self.num_beams = num_beams
        self.beams = []
        self.worst_score = 1e9

    def __len__(self):
        return len(self.beams)

    def add(self, hyp, sum_logprobs: float):
        score = sum_logprobs / hyp.shape[-1]
        if len(self) < self.num_beams or score > self.worst_score:
            self.beams.append((score, hyp))
            if len(self) > self.num_beams:
                sorted_next = sorted((s, i) for i, (s, _) in
                                     enumerate(self.beams))
                del self.beams[sorted_next[0][1]]
                self.worst_score = sorted_next[1][0]
            else:
                self.worst_score = min(score, self.worst_score)

    def is_done(self, best_sum_logprobs: float, cur_len: int) -> bool:
        if len(self) < self.num_beams:
            return False
        return self.worst_score >= best_sum_logprobs / cur_len


class OldBeamSearchScorer:
    """Vintage BeamSearchScorer: `_beam_hyps` is one pool per BATCH."""

    def __init__(self, batch_size: int, num_beams: int, device=None,
                 length_penalty: float = 1.0, do_early_stopping: bool = False,
                 num_beam_hyps_to_keep: int = 1, num_beam_groups: int = 1,
                 **kwargs):
        assert length_penalty == 1.0 and not do_early_stopping, \
            "oracle implements the reference call signature only"
        self.num_beams = num_beams
        self.num_beam_groups = num_beam_groups
        self.group_size = num_beams // num_beam_groups
        self.num_beam_hyps_to_keep = num_beam_hyps_to_keep
        self._beam_hyps = [_BeamHyps(num_beams) for _ in range(batch_size)]
        self._done = [False] * batch_size

    @property
    def is_done(self) -> bool:
        return all(self._done)

    def process(self, input_ids, next_scores, next_tokens, next_indices,
                pad_token_id=None, eos_token_id=None, beam_indices=None):
        import torch

        cur_len = input_ids.shape[-1] + 1
        batch_size = len(self._beam_hyps)
        gs = self.group_size
        next_beam_scores = torch.zeros((batch_size, gs),
                                       dtype=next_scores.dtype)
        next_beam_tokens = torch.zeros((batch_size, gs),
                                       dtype=next_tokens.dtype)
        next_beam_indices = torch.zeros((batch_size, gs),
                                        dtype=next_indices.dtype)
        for b in range(batch_size):
            if self._done[b]:
                next_beam_scores[b, :] = 0
                next_beam_tokens[b, :] = pad_token_id
                next_beam_indices[b, :] = 0
                continue
            beam_idx = 0
            for rank, (tok, score, src) in enumerate(
                    zip(next_tokens[b], next_scores[b], next_indices[b])):
                batch_beam_idx = b * gs + src
                if int(tok) == eos_token_id:
                    if rank >= gs:
                        continue
                    self._beam_hyps[b].add(
                        input_ids[batch_beam_idx].clone(), float(score))
                else:
                    next_beam_scores[b, beam_idx] = score
                    next_beam_tokens[b, beam_idx] = tok
                    next_beam_indices[b, beam_idx] = batch_beam_idx
                    beam_idx += 1
                if beam_idx == gs:
                    break
            self._done[b] = self._done[b] or self._beam_hyps[b].is_done(
                float(next_scores[b].max()), cur_len)
        return {"next_beam_scores": next_beam_scores.view(-1),
                "next_beam_tokens": next_beam_tokens.view(-1),
                "next_beam_indices": next_beam_indices.view(-1)}

    def finalize(self, input_ids, final_beam_scores, final_beam_tokens,
                 final_beam_indices, max_length, pad_token_id=None,
                 eos_token_id=None, beam_indices=None):
        import torch

        batch_size = len(self._beam_hyps)
        for b, hyp_pool in enumerate(self._beam_hyps):
            if self._done[b]:
                continue
            for beam_id in range(self.num_beams):
                idx = b * self.num_beams + beam_id
                hyp_pool.add(input_ids[idx], float(final_beam_scores[idx]))
        sent_lengths = input_ids.new(batch_size * self.num_beam_hyps_to_keep)
        best = []
        for b in range(batch_size):
            sorted_hyps = sorted(self._beam_hyps[b].beams,
                                 key=lambda x: x[0])
            for j in range(self.num_beam_hyps_to_keep):
                _, hyp = sorted_hyps.pop()
                sent_lengths[self.num_beam_hyps_to_keep * b + j] = len(hyp)
                best.append(hyp)
        sent_max_len = min(int(sent_lengths.max()) + 1, max_length)
        decoded = input_ids.new(batch_size * self.num_beam_hyps_to_keep,
                                sent_max_len)
        if int(sent_lengths.min()) != int(sent_lengths.max()):
            decoded.fill_(pad_token_id)
        for i, hyp in enumerate(best):
            decoded[i, :sent_lengths[i]] = hyp
            if sent_lengths[i] < sent_max_len:
                decoded[i, sent_lengths[i]] = eos_token_id
        return {"sequences": decoded}


def arm_reference_beamsearch(coca_module):
    """Patch a loaded reference coca_model module so generate() works."""
    import torch
    from transformers.generation.logits_process import (
        LogitsProcessorList, MinLengthLogitsProcessor,
        RepetitionPenaltyLogitsProcessor, TopKLogitsWarper, TopPLogitsWarper)
    from transformers.generation.stopping_criteria import (
        MaxLengthCriteria, StoppingCriteriaList)

    class ScalarStoppingCriteriaList(StoppingCriteriaList):
        """Pre-4.4x semantics: a single python bool for the whole batch."""

        def __call__(self, input_ids, scores, **kwargs):
            out = super().__call__(input_ids, scores, **kwargs)
            return bool(torch.as_tensor(out).all())

    coca_module.BeamSearchScorer = OldBeamSearchScorer
    coca_module.LogitsProcessorList = LogitsProcessorList
    coca_module.MinLengthLogitsProcessor = MinLengthLogitsProcessor
    coca_module.RepetitionPenaltyLogitsProcessor = (
        RepetitionPenaltyLogitsProcessor)
    coca_module.MaxLengthCriteria = MaxLengthCriteria
    coca_module.StoppingCriteriaList = ScalarStoppingCriteriaList
    coca_module.GENERATION_TYPES = {
        "top_k": TopKLogitsWarper,
        "top_p": TopPLogitsWarper,
        "beam_search": "beam_search",
    }
    coca_module._has_transformers = True
    return coca_module
