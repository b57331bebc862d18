"""Package-quality checks — the analog of the reference's doctest / JET /
Aqua static-analysis test items (test_doctests.jl, test_jet.jl,
test_aqua.jl)."""

import doctest
import importlib
import pkgutil

import ldpcdecoders_tpu


def test_doctests():
    for mod_name in (
        "ldpcdecoders_tpu.codes.gallager",
        "ldpcdecoders_tpu.codes.qc",
        "ldpcdecoders_tpu.codes.bicycle",
        "ldpcdecoders_tpu.models.qc_minsum",
        "ldpcdecoders_tpu.models.peeling",
        "ldpcdecoders_tpu.config",
        "ldpcdecoders_tpu.utils.metrics",
        "ldpcdecoders_tpu.models.bp",
        "ldpcdecoders_tpu.models.bposd",
        "ldpcdecoders_tpu.models.bitflip",
        "ldpcdecoders_tpu.models.bpots",
        "ldpcdecoders_tpu.models.minsum",
        "ldpcdecoders_tpu.models.mixed",
        "ldpcdecoders_tpu.models.neural",
    ):
        mod = importlib.import_module(mod_name)
        results = doctest.testmod(mod)
        assert results.failed == 0, f"doctest failures in {mod_name}"
        assert results.attempted > 0, f"no doctests found in {mod_name}"


def test_every_module_imports():
    """Every submodule imports cleanly (no circular imports, no missing
    deps) — the 'package quality' analog of Aqua.jl."""
    failures = []
    for info in pkgutil.walk_packages(
        ldpcdecoders_tpu.__path__, prefix="ldpcdecoders_tpu."
    ):
        try:
            importlib.import_module(info.name)
        except Exception as e:  # pragma: no cover
            failures.append((info.name, repr(e)))
    assert not failures, failures


def test_all_exports_exist():
    """__all__ names resolve in every module that declares one."""
    for info in pkgutil.walk_packages(
        ldpcdecoders_tpu.__path__, prefix="ldpcdecoders_tpu."
    ):
        mod = importlib.import_module(info.name)
        for name in getattr(mod, "__all__", ()):
            assert hasattr(mod, name), f"{info.name}.__all__ names missing {name}"


def test_top_level_api_surface():
    """The public names promised by the docs exist at the package root."""
    expected = [
        "parity_check_matrix", "save_pcm", "load_pcm", "TannerGraph",
        "toric_code_x", "toric_code_z", "surface_code_x", "surface_code_z",
        "repetition_code", "cycle_matrix", "hamming_code", "hypergraph_product",
        "Decoder", "DecodeStats", "decode", "batchdecode",
        "BeliefPropagationDecoder", "BeliefPropagationOSDDecoder",
        "BitFlipDecoder", "BPOTSDecoder", "MinSumDecoder",
        "QuantizedMinSumDecoder", "LayeredMinSumDecoder", "BucketedDecoder",
        "QCMinSumDecoder", "ErasurePeelingDecoder", "MixedChannelDecoder",
        "NeuralMinSumDecoder", "EnsembleDecoder",
        "SpaceTimeDecoder", "SlidingWindowDecoder", "DetectorGraphDecoder",
        "load_dem",
        "StabilizerCircuit", "css_memory_circuit", "circuit_dem",
        "dem_text", "sample_circuit",
        "decode_soft",
        "qc_lift", "random_qc_base_matrix",
        "bivariate_bicycle_code", "named_bicycle_code", "css_code_k",
        "DecoderConfig", "enable_compilation_cache", "parallel",
    ]
    for name in expected:
        assert hasattr(ldpcdecoders_tpu, name), name


def test_default_cache_hook(monkeypatch):
    """Decoder use auto-enables the persistent compile cache exactly once,
    and LDPC_JAX_CACHE=off opts out."""
    from ldpcdecoders_tpu import cache

    calls = []
    monkeypatch.setattr(cache, "enable_compilation_cache", lambda *a: calls.append(1))
    monkeypatch.setattr(cache, "_configured", False)
    monkeypatch.setenv("LDPC_JAX_CACHE", "off")
    cache.ensure_default_cache()
    assert not calls  # opted out
    assert cache._configured  # but still latched (no re-check per decode)
