"""Stage-1 tests: parser, cache, client plumbing, benchmark generator."""

import json
import os

import pytest

from lvd_tpu.eval import benchmark
from lvd_tpu.text.cache import ResponseCache
from lvd_tpu.text.parser import (
    LayoutParseError,
    get_parsed_layout_with_cache,
    parse_layout_response,
    parse_layout_response_json,
)

SAMPLE_RESPONSE = (
    "Reasoning: the car moves to the right.\n"
    "Frame 1: [{'id': 0, 'name': 'car', 'box': [50, 220, 100, 60]}]\n"
    "Frame 2: [{'id': 0, 'name': 'car', 'box': [100, 220, 100, 60]}]\n"
    "Frame 3: [{'id': 0, 'name': 'car', 'box': [150, 220, 100, 60]}]\n"
    "Frame 4: [{'id': 0, 'name': 'car', 'box': [200, 220, 100, 60]}]\n"
    "Frame 5: [{'id': 0, 'name': 'car', 'box': [250, 220, 100, 60]}]\n"
    "Frame 6: [{'id': 0, 'name': 'car', 'box': [300, 220, 100, 60]}]\n"
    "Background keyword: street"
)


def test_parse_complete_response():
    parsed, reconstructed = parse_layout_response("a car", response=SAMPLE_RESPONSE)
    assert parsed["Prompt"] == "a car"
    assert parsed["Background keyword"] == "street"
    assert parsed["Frame 1"] == [{"id": 0, "name": "car", "box": [50, 220, 100, 60]}]
    assert parsed["Frame 6"][0]["box"] == [300, 220, 100, 60]
    # Round trip: reconstruction parses to the same layout.
    parsed2, _ = parse_layout_response("a car", response=reconstructed)
    assert parsed2 == parsed


def test_parse_markdown_and_comments():
    noisy = SAMPLE_RESPONSE.replace(
        "Frame 2: [{'id': 0, 'name': 'car', 'box': [100, 220, 100, 60]}]",
        "Frame 2: - [{'id': 0, 'name': 'car', 'box': [100, 220, 100, 60]}] - the car moved",
    )
    noisy = "```\n" + noisy + "\n```"
    parsed, _ = parse_layout_response("a car", response=noisy)
    assert parsed["Frame 2"][0]["box"] == [100, 220, 100, 60]
    assert parsed["Background keyword"] == "street"


def test_parse_partial_continuation():
    lines = SAMPLE_RESPONSE.split("\n")
    first = "\n".join(lines[:4])  # reasoning + frames 1..3
    rest = "\n".join(lines[4:])  # frames 4..6 + background

    calls = []

    def fetch(suffix):
        calls.append(suffix)
        if len(calls) == 1:
            return first
        # The parser could not consume frame 3 until it saw "Frame 4:", so it
        # asks to continue from "Frame 3:" with the accumulated tail.
        assert suffix is not None and suffix.endswith("Frame 3:")
        return "Frame 3:" + SAMPLE_RESPONSE.split("Frame 3:", 1)[1]

    parsed, reconstructed = parse_layout_response(
        "a car", fetch=fetch, max_partial_response_retries=3
    )
    assert len(calls) == 2
    assert parsed["Frame 6"][0]["box"] == [300, 220, 100, 60]
    parsed2, _ = parse_layout_response("a car", response=reconstructed)
    assert {k: v for k, v in parsed2.items()} == {k: v for k, v in parsed.items()}


def test_parse_garbage_raises():
    with pytest.raises(LayoutParseError):
        parse_layout_response("x", response="Frame 1: not a list\nFrame 2: []"
                              "\nFrame 3: []\nFrame 4: []\nFrame 5: []\nFrame 6: []"
                              "\nBackground keyword: sky")


def test_parse_json_response():
    layout = {
        "Reasoning": "r",
        **{f"Frame {i}": [{"id": 0, "name": "cat", "box": [0, 0, 10, 10]}] for i in range(1, 7)},
        "Background keyword": "room",
    }
    parsed, _ = parse_layout_response_json("a cat", response=json.dumps(layout))
    assert parsed["Background keyword"] == "room"
    assert parsed["Prompt"] == "a cat"


def test_cache_sequential_multivalue(tmp_path):
    path = str(tmp_path / "cache.json")
    cache = ResponseCache(path)
    cache.load()
    assert cache.get("p") is None
    cache.add("p", "r1")
    cache.add("p", "r2")

    cache2 = ResponseCache(path)
    cache2.load()
    assert cache2.get("p") == "r1"
    assert cache2.get("p") == "r2"
    assert cache2.get("p") is None
    assert cache2.values_accessed() == 2
    cache2.reset_access()
    assert cache2.get("p") == "r1"


def test_get_parsed_layout_with_cache(tmp_path):
    cache = ResponseCache(str(tmp_path / "c.json"))
    cache.load()
    fetches = []

    def fetch(suffix):
        fetches.append(suffix)
        return SAMPLE_RESPONSE

    parsed = get_parsed_layout_with_cache("a car", cache, fetch=fetch)
    assert parsed["Background keyword"] == "street"
    assert len(fetches) == 1
    # Second run in a fresh session hits the cache, not the network.
    cache.reset_access()
    parsed2 = get_parsed_layout_with_cache("a car", cache, fetch=None)
    assert parsed2 == parsed


def test_benchmark_counts_and_types():
    pp = benchmark.get_lvd_full_prompt_predicates("lvd")
    assert len(pp) == 500
    by_type = {}
    for _, pred in pp:
        by_type[pred.type] = by_type.get(pred.type, 0) + 1
    assert by_type == {
        "numeracy": 100,
        "attribution": 100,
        "visibility": 100,
        "dynamic_spatial": 100,
        "sequential": 100,
    }
    # Deterministic across calls (np.random is seeded per index).
    pp2 = benchmark.get_lvd_full_prompt_predicates("lvd")
    assert [p for p, _ in pp] == [p for p, _ in pp2]


def test_benchmark_prompt_samples():
    prompts = benchmark.get_lvd_full_prompts("lvd")
    assert "A realistic lively video of a scene with one moving car" in prompts
    assert (
        "A realistic lively video of a scene with four walking dogs" in prompts
    )
    assert any("appears only in the second half of the video" in p for p in prompts)
    assert any("moving from the left to the right" in p for p in prompts)
    assert any(p.startswith("A realistic lively video of a top-down") for p in prompts)
