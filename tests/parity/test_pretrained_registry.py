"""Pretrained tag registry parity vs the reference table.

The reference's `_PRETRAINED` (da-clip/src/open_clip/pretrained.py:30-283) is
a pure data table: model → tag → {url | hf_hub, mean/std}.  This test execs
that table out of the reference source (dev-only; skipped when /root/reference
is absent) and asserts ours matches it model-for-model, tag-for-tag,
URL-for-URL — including the DataComp/CommonPool families our registry
generates with `_pool_tags` instead of writing out longhand.
"""
import os

import pytest

REF = "/root/reference/da-clip/src/open_clip/pretrained.py"


@pytest.mark.regression_test
def test_pretrained_registry_matches_reference():
    if not os.path.exists(REF):
        pytest.skip("reference checkout not available")
    src = open(REF).read()
    table_src = src[src.index("_RN50 = dict("):src.index("def _clean_tag")]
    ns = {"_pcfg": lambda url="", hf_hub="", mean=None, std=None:
          {"url": url, "hf_hub": hf_hub, "mean": mean, "std": std}}
    exec(table_src, ns)  # data-only source segment
    ref = ns["_PRETRAINED"]

    from daclip_tpu.models.pretrained import _PRETRAINED as ours
    assert set(ref) == set(ours)
    for model in ref:
        assert set(ref[model]) == set(ours[model]), model
        for tag, cfg in ref[model].items():
            o = ours[model][tag]
            assert (cfg.get("url") or "") == (o.get("url") or ""), (model, tag)
            assert (cfg.get("hf_hub") or "") == (o.get("hf_hub") or ""), (model, tag)
            assert (cfg.get("mean") or None) == (o.get("mean") or None), (model, tag)
            assert (cfg.get("std") or None) == (o.get("std") or None), (model, tag)
