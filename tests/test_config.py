"""Config / CLI surface tests: flag names, defaults, quirks, validation
(ref: fumi/utils/utils.py:19-229, fumi/main.py:34-44)."""

import pytest

from fumi_tpu.core.config import Config, config_from_args


def test_defaults_match_reference():
    cfg = config_from_args([])
    # ref utils.py defaults
    assert cfg.epochs == 50000
    assert cfg.optim == "adam"
    assert cfg.lr == 3e-5
    assert cfg.batch_size == 4
    assert cfg.weight_decay == 5e-4
    assert cfg.num_shots == 5
    assert cfg.num_ways == 5
    assert cfg.num_shots_test == 32
    assert cfg.model == "fumi"
    assert cfg.prototype_dim == 64
    assert cfg.im_emb_dim == 2048
    assert cfg.im_hid_dim == (256, 64)
    assert cfg.text_encoder == "BERT"
    assert cfg.text_emb_dim == 768
    assert cfg.text_hid_dim == 256
    assert cfg.dropout == 0.25
    assert cfg.step_size == 0.01
    assert cfg.num_train_adapt_steps == 5
    assert cfg.num_test_adapt_steps == 100
    assert cfg.lamda_fixed is None
    assert cfg.clip_latent_dim == 512
    assert cfg.seed == 123
    assert cfg.patience == 10000
    assert cfg.eval_freq == 2500
    assert cfg.num_ep_test == 1000


def test_flag_parsing():
    cfg = config_from_args([
        "--model", "am3", "--num_shots", "1", "--im_hid_dim", "128", "32",
        "--text_type", "label", "description", "--lamda_fixed", "0",
        "--first_order", "--fine_tune", "--evaluate",
    ])
    assert cfg.model == "am3"
    assert cfg.num_shots == 1
    assert cfg.im_hid_dim == (128, 32)
    assert cfg.text_type == ("label", "description")
    assert cfg.lamda_fixed == 0
    assert cfg.first_order and cfg.fine_tune and cfg.evaluate


def test_query_size_quirks():
    """--num_shots_test is the TRAIN query size; val/test always use
    int(100/num_ways) (ref: data.py:165,182)."""
    cfg = config_from_args(["--num_ways", "3", "--num_shots_test", "7"])
    assert cfg.num_query_train == 7
    assert cfg.num_query_eval == 33
    assert cfg.max_test_batches == 250  # 1000 / 4 (ref: main.py:48)


def test_resnet_dim_validation():
    with pytest.raises(ValueError):
        config_from_args(["--im_emb_dim", "512"])  # resnet-152 wants 2048
    with pytest.raises(ValueError):
        config_from_args(["--image_embedding_model", "resnet-34"])  # wants 512
    cfg = config_from_args(["--image_embedding_model", "resnet-34",
                            "--im_emb_dim", "512"])
    assert cfg.im_emb_dim == 512
    # synthetic dataset skips the coupling
    cfg = Config(dataset="synthetic", im_emb_dim=64)
    cfg.validate()


def test_bad_text_encoder_and_type():
    with pytest.raises(SystemExit):  # argparse choices
        config_from_args(["--text_encoder", "bogus"])
    with pytest.raises(NameError):
        Config(text_type=("bogus",)).validate()


def test_config_hashable_and_replace():
    cfg = Config()
    assert hash(cfg) == hash(Config())
    cfg2 = cfg.replace(num_ways=3)
    assert cfg2.num_ways == 3 and cfg.num_ways == 5
    assert hash(cfg2) != hash(cfg)


def test_tpu_extension_flags():
    cfg = config_from_args([
        "--tpu_prng_impl", "threefry2x32", "--tpu_mesh_dp", "2",
        "--tpu_host_sampler", "--tpu_pallas_gather",
        "--tpu_compute_dtype", "bfloat16", "--tpu_im_size", "32",
        "--tpu_debug_nans", "--tpu_pallas_fused_eval",
        "--tpu_skip_nonfinite", "4", "--tpu_mesh_mp", "2",
    ])
    assert cfg.prng_impl == "threefry2x32"
    assert cfg.mesh_dp == 2
    assert not cfg.device_sampler
    assert cfg.pallas_gather
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.im_size == 32
    assert cfg.debug_nans
    assert cfg.pallas_fused_eval
    assert cfg.skip_nonfinite == 4
    assert cfg.mesh_mp == 2


def test_meta_grad_support_matrix():
    """--tpu_meta_grad / --tpu_adapt_params are consulted only by the
    families that implement them; other models must reject the flags
    instead of silently training under the default engine.
    Matrix: imaml → maml+fumi; reptile → maml; ANIL → maml."""
    import pytest

    from fumi_tpu.core.config import Config

    rejected = [
        dict(model="am3", meta_grad="imaml"),
        dict(model="protonet", meta_grad="imaml"),
        dict(model="fumi", meta_grad="reptile"),
        dict(model="fumi", adapt_params="head"),
        dict(model="am3", adapt_params="head"),
    ]
    # fumi+imaml with dropout on would SILENTLY train dropout-free (the
    # implicit solve needs a deterministic objective) — must be rejected
    rejected.append(dict(model="fumi", meta_grad="imaml", dropout=0.25))
    for kw in rejected:
        with pytest.raises(NotImplementedError):
            Config(dataset="synthetic", **kw).validate()
    Config(model="maml", dataset="synthetic", meta_grad="imaml").validate()
    Config(model="fumi", dataset="synthetic", meta_grad="imaml",
           dropout=0.0).validate()
    Config(model="maml", dataset="synthetic",
           meta_grad="reptile").validate()
    Config(model="maml", dataset="synthetic",
           adapt_params="head").validate()


def test_tpu_import_registers_out_of_tree_family(tmp_path, monkeypatch):
    """--tpu_import loads extension modules BEFORE validation so
    out-of-tree registered families work from the CLI."""
    import sys
    import textwrap

    mod = tmp_path / "my_families.py"
    mod.write_text(textwrap.dedent("""
        from fumi_tpu.train.steps import build_protonet_family, \\
            register_family

        @register_family("outoftree")
        def build(cfg, key, dictionary=None):
            return build_protonet_family(cfg, key)._replace(
                name="outoftree")
    """))
    monkeypatch.syspath_prepend(str(tmp_path))
    from fumi_tpu.core.config import config_from_args
    from fumi_tpu.train.steps import FAMILY_REGISTRY, build_family

    try:
        cfg = config_from_args([
            "--tpu_import", "my_families", "--model", "outoftree",
            "--dataset", "synthetic", "--im_emb_dim", "16",
            "--prototype_dim", "8"])
        assert cfg.model == "outoftree"
        assert cfg.import_modules == ("my_families",)
        import jax
        fam = build_family(cfg, jax.random.PRNGKey(0))
        assert fam.name == "outoftree"
        # without the import, the same --model is rejected at validation
        FAMILY_REGISTRY.pop("outoftree", None)
        import pytest as _pt
        with _pt.raises(ValueError, match="outoftree"):
            config_from_args(["--model", "outoftree",
                              "--dataset", "synthetic"])
    finally:
        FAMILY_REGISTRY.pop("outoftree", None)
        sys.modules.pop("my_families", None)


def test_chunk_and_unroll_flags():
    """--tpu_chunk/--tpu_train_unroll plumb into Config and reject
    negatives (0 = auto)."""
    from fumi_tpu.core.config import config_from_args
    cfg = config_from_args(["--tpu_chunk", "250", "--tpu_train_unroll", "2"])
    assert cfg.chunk == 250 and cfg.train_unroll == 2
    cfg = config_from_args([])
    assert cfg.chunk == 0 and cfg.train_unroll == 0
    import pytest as _pytest
    from fumi_tpu.core.config import Config
    with _pytest.raises(ValueError, match="tpu_chunk"):
        Config(chunk=-1).validate()


def test_train_scan_unroll_override():
    from fumi_tpu.train.steps import train_scan_unroll
    assert train_scan_unroll(1000) == 4       # measured default
    assert train_scan_unroll(8) == 1          # short chunks skip unroll
    assert train_scan_unroll(1000, 8) == 8    # explicit override wins
    assert train_scan_unroll(8, 2) == 2
