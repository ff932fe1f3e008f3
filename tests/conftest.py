"""Test harness config.

Forces the CPU backend with 8 virtual devices BEFORE jax initializes, so
multi-device sharding tests (dp/tp over a `jax.sharding.Mesh`) run anywhere —
the strategy the reference never needed (it is single-GPU) but the rebuild's
parallel layer requires (SURVEY.md §4 test plan).
"""

import os

# NOTE: in this environment a sitecustomize pre-imports jax with
# JAX_PLATFORMS=axon (the tunneled TPU), so env vars set here are too late —
# jax.config.update below is what actually forces the CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu"

# Persistent compilation cache for the CPU test backend: identical test
# programs (the suite re-jits many identical tiny steps across sessions)
# hit the disk cache instead of recompiling (VERDICT r2 weakness 5).
# GIC_TEST_NO_CACHE=1 disables it for THIS PROCESS — scripts/test.sh runs
# the threaded-engine test modules in a separate no-cache invocation:
# jax's cache (de)serialization segfaults under compiles from background
# threads, and jax latches cache-enablement globally at the first compile
# (compilation_cache.is_cache_used caches _cache_used once per process),
# so no in-process opt-out can stick — the process boundary is the only
# airtight one (round-4 notes; faulthandler stacks in git history).
if os.environ.get("GIC_TEST_NO_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/gic_xla_tests"))
    # threshold 0: the suite's cost is a LONG TAIL of sub-0.5 s compiles
    # (433 tests × a few tiny programs each) that the old 0.5 s threshold
    # excluded from the cache entirely — cache them all (round-4 item 5)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "xla_gpu_per_fusion_autotune_cache_dir")
except Exception:
    pass

import pytest  # noqa: E402

# Modules whose tests compile on BACKGROUND THREADS (serving engine
# dispatchers).  scripts/test.sh runs these in a separate
# GIC_TEST_NO_CACHE=1 pytest process (see the cache note above — jax's
# enablement latch means only a process boundary isolates them; the full
# rationale lives at the top of gan_image_captioning_tpu/serving.py).
THREADED_ENGINE_FILES = (
    "test_serve.py", "test_serve_kernel.py", "test_serving_engine.py",
    "test_serving_fuzz.py", "test_serving_mesh.py",
    "test_quantize.py", "test_quantized_kernel.py", "test_export_model.py",
)

# ------------------------------------------------------------- slow markers
# The core pass (`pytest -m "not slow"`) must stay in the low minutes so it
# gets run routinely; everything below is the long tail (full-CLI e2e runs,
# config-space fuzzing, multi-step training trajectories, big sharded-step
# compiles) — still exercised by the unfiltered suite / CI script
# (scripts/test.sh).  Durations source: full-suite --durations run on the
# 8-virtual-CPU backend.
_SLOW_PATTERNS = (
    "test_fuzz_configs.py",
    "test_e2e_coco.py",
    # round-3 durations pass (--durations=25 cold, 1-core CPU): everything
    # >10 s moves to the long tail; each module keeps at least one cheap
    # representative in the core pass
    "test_cp_pp_in_steps.py",
    "test_encoder.py::test_resnet18_matches_torch_eval",
    "test_encoder.py::test_encoder_frozen_vs_trainable_gradients",
    "test_encoder.py::test_generator_forward_conditional",
    "test_kernel_mesh.py::test_sharded_kernel_step_equals_single_device",
    "test_disc_conv_kernel.py::test_adv_gradients_with_kernel",
    "test_disc_conv_kernel.py::test_hybrid_matches_xla",
    "test_disc_conv_kernel.py::test_kernel_matches_xla_gradients",
    "test_disc_conv_kernel.py::test_kernel_matches_xla_forward",
    "test_fuse_embed.py::test_full_adv_step_matches_unfused",
    "test_instructor.py::test_interrupt_checkpoints_and_stops",
    "test_decode.py::test_beam_width_monotonic_quality",
    "test_decode.py::test_beam_size_1_equals_greedy",
    "test_decoupled_decode.py::test_adv_step_losses_match_across_impls",
    "test_decoupled_decode.py::test_lstm_seq_tm_gradients_match_autodiff",
    "test_cli_tools.py::test_evaluate_cli",
    "test_serve_kernel.py::test_transformer_continuous_batcher",
    "test_lstm_bptt_kernel.py::test_bptt_kernel_in_full_sample_vjp",
    "test_vit_import.py::test_import_vit_cli",
    "test_parallel.py::test_mesh_kernel_decode_falls_back",
    "test_reinforce.py::test_reinforce_losses_finite_lstm",
    "test_reinforce.py::test_reinforce_transformer_pair",
    "test_transformer.py::test_conditional_transformer_uses_image_grid",
    "test_transformer.py::test_causal_mask_no_future_leak",
    "test_train_steps.py::test_disc_train_freq_gates_updates",
    "test_train_steps.py::test_adv_loop_learns_discriminator",
    "test_vit_gpt2.py::test_vit_shapes",
    "test_vit_gpt2.py::test_gpt2_tiny_decode_runs",
    "test_gpt2_import.py::test_gpt2_weights_reproduce_hf_logits",
    "test_pipeline.py::test_pipeline_transformer_blocks",
    "test_parallel.py::test_sharded_conditional_step",
    "test_parallel.py::test_sharded_step_equals_single_device",
    "test_parallel.py::test_sequence_parallel_transformer_mle",
    "test_instructor.py::test_training_is_deterministic",
    "test_instructor.py::test_cached_features_run",
    "test_instructor.py::test_resume_continues_counters",
    "test_instructor.py::test_eval_quality_hook",
    "test_instructor.py::test_run_schedule_and_checkpoints",
    "test_conditioning.py::test_features_vary_with_image_and_steer_logits",
    "test_conditioning.py::test_encoder_receives_training_gradient",
    "test_encoder.py::test_conditional_mle_step_runs_and_updates_bn_stats",
    "test_transformer.py::test_all_arch_pairs_train",
    "test_torch_training_parity.py",
    "test_discriminator_bilstm.py::test_bilstm_disc_trains_one_fused_step",
    "test_torch_import.py::test_convert_checkpoint_cli",
    "test_decoupled_decode.py::test_adv_gradients_match_across_impls",
    "test_reinforce.py::test_full_reinforce_adv_step",
    # round-3 cont-2 durations: resume long tail — the core pass keeps
    # mid-adv/periodic/geometry/scst resume as cheap representatives
    "test_resume_schedule.py::test_midpretrain_interrupt_resume_bitexact",
    "test_resume_schedule.py::test_fuzz_interrupt_anywhere_resume_bitexact",
    "test_resume_schedule.py::test_elastic_resume_across_mesh_sizes",
    "test_resume_schedule.py::test_auto_resume_cli_end_to_end",
    # round-3 cont-3: instructor-level steps-per-call trajectories — the
    # core pass keeps the scan==sequential unit equivalences
    "test_multi_step.py::test_instructor_steps_per_call_matches",
    "test_multi_step.py::test_interrupt_resume_under_steps_per_call",
    "test_multi_step.py::test_multi_adv_transformer_matches_sequential",
    # round-4 durations pass (warm cache, 17m53s total): next tier of the
    # tail moves out; every move keeps a cheaper core representative —
    # mxu fwd/grad parity stays (env-routing e2e moves), loss formulas
    # stay via test_losses.py torch oracles + standard/hinge variants,
    # conditional stays via test_augment/test_serve/test_conditional_export,
    # remat stays via flash_under_remat, early-stop stays via the adv leg,
    # resume stays via test_midadv_interrupt_resume_bitexact
    "test_disc_conv_kernel.py::test_mxu_env_routing_full_disc",
    "test_single_forward.py::test_conditional_mode",
    "test_single_forward.py::test_loss_variants[rsgan]",
    "test_single_forward.py::test_loss_variants[JS]",
    "test_single_forward.py::test_loss_variants[KL]",
    "test_single_forward.py::test_loss_variants[tv]",
    "test_export_model.py::test_exported_caption_cli_conditional",
    "test_early_stop.py::test_pretrain_early_stop_on_scripted_losses",
    "test_transformer.py::test_tf_remat_grads_identical",
    "test_instructor.py::test_resume_schedule_opt_out",
    "test_quality_metrics.py::test_evaluate_cli_reports_new_metrics",
    "test_discriminator.py::test_default_config_shapes",
    # warm-cache durations (8m07s run): last trims; loss formulas keep the
    # torch oracles (test_losses.py) + [standard] integration, SCST keeps
    # the LSTM e2e + bleu-reward + mesh phases in core
    "test_single_forward.py::test_loss_variants[hinge]",
    "test_scst.py::test_scst_transformer_generator",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-tail test, excluded from the core "
        "`-m 'not slow'` pass")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in _SLOW_PATTERNS):
            item.add_marker(pytest.mark.slow)
    # Safety latch for direct `pytest tests/` runs (not via scripts/test.sh):
    # if any threaded-engine module is collected in a cache-enabled process,
    # disable the persistent compile cache NOW — cache enablement only
    # latches at the first compile, which is after collection, so this is
    # early enough to be airtight.  Engine dispatcher threads + the disk
    # cache segfault (round-4 faulthandler stacks); scripts/test.sh keeps
    # the fast path by splitting those modules into a GIC_TEST_NO_CACHE=1
    # process so the main pass keeps its cache.
    if (os.environ.get("GIC_TEST_NO_CACHE") != "1"
            and os.environ.get("GIC_TEST_CACHE_ANYWAY") != "1"):
        # GIC_TEST_CACHE_ANYWAY=1: keep the cache WITH engine modules in
        # one process — FAST BUT NOT CRASH-SAFE (scripts/test.sh
        # core-cached): 3/3 clean at core scope, but the full suite
        # segfaulted in a MAIN-THREAD cache read while a serving _loop
        # thread merely existed idle (round-5 stack in
        # docs/artifacts/cache_segfault_r5/) — the thread-local opt-out
        # does not make the process safe; only the process boundary is.
        threaded = any(
            os.path.basename(str(item.fspath)) in THREADED_ENGINE_FILES
            for item in items)
        if threaded:
            jax.config.update("jax_compilation_cache_dir", None)
            sys.stderr.write(
                "[conftest] threaded-engine test modules collected in a "
                "cache-enabled process: persistent compile cache DISABLED "
                "for this run (jax cache + background-thread compiles "
                "segfault).  Use scripts/test.sh for the fast cached "
                "split.\n")


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
