"""Golden tests against the reference's shipped LLM-response caches.

These verify (1) our benchmark prompt generator reproduces the exact prompt
strings the caches are keyed by, and (2) our parser parses every shipped raw
response into a well-formed layout. Skipped when the reference checkout is
not present.
"""

import json
import os

import pytest

from conftest import REFERENCE_DIR, reference_available
from lvd_tpu.eval import benchmark, harness
from lvd_tpu.text.parser import parse_layout_response
from lvd_tpu.text.templates import canonical_prompt

CACHES = [
    os.path.join(REFERENCE_DIR, "cache", name)
    for name in (
        "cache_lvd_v0.1_gpt-3.5-turbo.json",
        "cache_lvd_v0.1_gpt-4-1106-preview.json",
    )
]

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


def test_benchmark_prompts_match_cache_keys():
    prompts = {canonical_prompt(p) for p in benchmark.get_lvd_full_prompts("lvd")}
    for path in CACHES:
        keys = set(json.load(open(path)))
        missing = keys - prompts
        assert not missing, f"benchmark does not generate: {sorted(missing)[:5]}"
        # Every benchmark prompt should be answerable from the shipped cache.
        uncovered = prompts - keys
        assert not uncovered, f"cache missing prompts: {sorted(uncovered)[:5]}"


def test_parse_all_shipped_responses():
    total, parsed_ok = 0, 0
    for path in CACHES:
        cache = json.load(open(path))
        for prompt, responses in cache.items():
            for response in responses:
                total += 1
                parsed, reconstructed = parse_layout_response(
                    prompt, response=response
                )
                assert parsed["Prompt"] == prompt
                assert isinstance(parsed["Background keyword"], str)
                for k in range(1, 7):
                    frame = parsed[f"Frame {k}"]
                    assert isinstance(frame, list)
                    for obj in frame:
                        assert {"id", "box"} <= set(obj)
                        assert len(obj["box"]) == 4
                # Reconstruction must re-parse identically.
                again, _ = parse_layout_response(prompt, response=reconstructed)
                assert again == parsed
                parsed_ok += 1
    assert parsed_ok == total and total > 900


def test_stage1_scores_on_shipped_gpt4_cache():
    """Replicates scripts/eval_stage_one.py on the shipped GPT-4 cache; the
    reference README reports 98% overall for GPT-4 layouts."""
    cache = json.load(
        open(os.path.join(REFERENCE_DIR, "cache", "cache_lvd_v0.1_gpt-4-1106-preview.json"))
    )
    pp = benchmark.get_lvd_full_prompt_predicates("lvd")
    access = {}
    successes, counts = {}, {}
    for prompt, predicate in pp:
        prompt = canonical_prompt(prompt)
        idx = access.get(prompt, 0)
        access[prompt] = idx + 1
        responses = cache[prompt]
        response = responses[min(idx, len(responses) - 1)]
        parsed, _ = parse_layout_response(prompt, response=response)
        task, ok = harness.evaluate_with_layout(
            parsed, predicate, num_parsed_layout_frames=6, height=512, width=512
        )
        successes[task] = successes.get(task, 0) + int(ok)
        counts[task] = counts.get(task, 0) + 1

    rates = {t: successes[t] / counts[t] for t in counts}
    overall = sum(successes.values()) / sum(counts.values())
    # Reference README.md:57: 100/100/100/100/88 -> 98% overall for GPT-4.
    assert rates["numeracy"] >= 0.99
    assert rates["attribution"] >= 0.99
    assert rates["visibility"] >= 0.99
    assert rates["dynamic_spatial"] >= 0.95
    assert rates["sequential"] >= 0.80
    assert overall >= 0.95
