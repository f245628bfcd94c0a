"""Encoder layer tests.

Mirrors the reference's encoder suite (reference: src/llm/hf.rs:127-317):
dim=768 and non-degenerate values, batch rows differ, empty-string error,
empty batch -> [], determinism across calls — plus the tokenizer fixed-shape
contract and the Flax NomicBERT forward (random-init, shape/grad checks).
"""

import numpy as np
import pytest

from better_search_rag_rust_tpu.config import EncoderConfig
from better_search_rag_rust_tpu.models import (
    EncoderService,
    HashEncoder,
    HashingTokenizer,
    NomicBertConfig,
    NomicEncoder,
    create_encoder,
)
from better_search_rag_rust_tpu.models.tokenizer import TokenizerError


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------


def test_hashing_tokenizer_fixed_shape():
    tok = HashingTokenizer(vocab_size=1000, max_tokens=16)
    ids, mask = tok.encode_batch(["hello world", "a"])
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    assert ids.dtype == np.int32
    # CLS + 2 tokens + SEP
    assert mask[0].sum() == 4 and mask[1].sum() == 3
    # right-padded with PAD_ID=0 (reference: src/llm/hf.rs:70-71)
    assert (ids[0][mask[0] == 0] == 0).all()


def test_hashing_tokenizer_deterministic():
    tok = HashingTokenizer(vocab_size=5000, max_tokens=32)
    a, _ = tok.encode_batch(["def foo(): pass"])
    b, _ = tok.encode_batch(["def foo(): pass"])
    np.testing.assert_array_equal(a, b)


def test_hashing_tokenizer_truncates():
    tok = HashingTokenizer(vocab_size=1000, max_tokens=8)
    ids, mask = tok.encode_batch(["w " * 100])
    assert ids.shape == (1, 8)
    assert mask[0].sum() == 8


def test_tokenizer_rejects_empty_string():
    tok = HashingTokenizer()
    # reference: src/llm/hf.rs:54-56 "Invalid inputs: has empty values"
    with pytest.raises(TokenizerError, match="has empty values"):
        tok.encode_batch(["ok", ""])


def test_tokenizer_empty_batch():
    tok = HashingTokenizer(max_tokens=16)
    ids, mask = tok.encode_batch([])
    assert ids.shape == (0, 16)


# ---------------------------------------------------------------------------
# Hash encoder service (hermetic backend)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hash_service():
    return create_encoder(
        EncoderConfig(backend="hash", dim=64, vocab_size=2048, max_tokens=64,
                      batch_size=4)
    )


def test_embeddings_shape_and_values(hash_service):
    # reference: src/llm/hf.rs:170-202 — correct dim, non-degenerate values
    out = hash_service.get_embeddings(["public class Foo {}", "import jax"])
    assert out.shape == (2, 64)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
    assert np.abs(out).sum() > 0
    # rows are L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=1), 1.0, rtol=1e-4
    )


def test_embeddings_batch_rows_differ(hash_service):
    # reference: src/llm/hf.rs:204-239
    out = hash_service.get_embeddings(["alpha beta gamma", "delta epsilon"])
    assert not np.allclose(out[0], out[1])


def test_embeddings_empty_string_error(hash_service):
    # reference: src/llm/hf.rs:241-265
    with pytest.raises(TokenizerError, match="has empty values"):
        hash_service.get_embeddings(["fine", ""])


def test_embeddings_empty_batch(hash_service):
    # reference: src/llm/hf.rs:267-287
    out = hash_service.get_embeddings([])
    assert out.shape == (0, 64)


def test_embeddings_deterministic(hash_service):
    # reference: src/llm/hf.rs:289-316
    a = hash_service.get_embeddings(["static void main", "class B"])
    b = hash_service.get_embeddings(["static void main", "class B"])
    np.testing.assert_array_equal(a, b)


def test_ragged_batch_padding(hash_service):
    """Fixed-shape re-batching: 5 texts through batch_size=4 must equal the
    same texts encoded individually."""
    texts = [f"token{i} content here" for i in range(5)]
    full = hash_service.get_embeddings(texts)
    assert full.shape == (5, 64)
    for i, t in enumerate(texts):
        single = hash_service.get_embeddings([t])
        np.testing.assert_allclose(full[i], single[0], atol=1e-6)


def test_similar_texts_are_nearer(hash_service):
    a, b, c = hash_service.get_embeddings(
        [
            "public static void main string args",
            "public static void main string argv",
            "zzz qqq completely unrelated xxx yyy",
        ]
    )
    assert a @ b > a @ c


# ---------------------------------------------------------------------------
# NomicBERT forward (random init — shape, mask, determinism)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_nomic():
    cfg = NomicBertConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        mlp_dim=128, max_tokens=32,
    )
    return NomicEncoder(cfg, seed=0)


def test_nomic_forward_shape(tiny_nomic):
    ids = np.random.default_rng(0).integers(0, 512, size=(3, 32)).astype(np.int32)
    mask = np.ones((3, 32), dtype=np.int32)
    out = tiny_nomic.encode_tokens(ids, mask)
    assert out.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-3)


def test_nomic_mask_ignores_padding(tiny_nomic):
    """A padded row must encode identically regardless of pad-token ids."""
    rng = np.random.default_rng(1)
    ids_a = rng.integers(1, 512, size=(1, 32)).astype(np.int32)
    ids_b = ids_a.copy()
    mask = np.zeros((1, 32), dtype=np.int32)
    mask[0, :10] = 1
    ids_b[0, 10:] = 0  # different pad ids beyond the mask
    out_a = tiny_nomic.encode_tokens(ids_a, mask)
    out_b = tiny_nomic.encode_tokens(ids_b, mask)
    np.testing.assert_allclose(out_a, out_b, atol=2e-2)


def test_nomic_deterministic(tiny_nomic):
    ids = np.arange(32, dtype=np.int32).reshape(1, 32) % 512
    mask = np.ones((1, 32), dtype=np.int32)
    a = tiny_nomic.encode_tokens(ids, mask)
    b = tiny_nomic.encode_tokens(ids, mask)
    np.testing.assert_array_equal(a, b)


def test_nomic_mesh_dp_encode_matches_single_device(tiny_nomic):
    """Mesh-DP encoding (batch sharded over 8 devices, fused attention via
    shard_map) agrees with the single-device encoder to bf16 noise, and the
    service contract composes through create_encoder(mesh=...)."""
    from better_search_rag_rust_tpu.config import EncoderConfig
    from better_search_rag_rust_tpu.models.encoder import create_encoder
    from better_search_rag_rust_tpu.parallel import create_mesh

    mesh = create_mesh(shape=(8,), axis_names=("data",))
    enc_dp = NomicEncoder(tiny_nomic.config, params=tiny_nomic.params,
                          mesh=mesh)
    assert enc_dp.config.dp_shard_attention == "data"

    rng = np.random.default_rng(7)
    ids = rng.integers(1, 512, size=(16, 32)).astype(np.int32)
    mask = np.ones((16, 32), dtype=np.int32)
    ref = tiny_nomic.encode_tokens(ids, mask)
    out = enc_dp.encode_tokens(ids, mask)
    assert out.shape == ref.shape
    cos = (out * ref).sum(axis=1)
    assert (cos > 0.999).all(), f"mesh-DP embeddings drifted: {cos.min()}"

    # batch_size must divide the mesh
    with pytest.raises(ValueError, match="does not divide"):
        create_encoder(
            EncoderConfig(backend="nomic", batch_size=12), mesh=mesh
        )


def test_nomic_matryoshka_truncation():
    cfg = NomicBertConfig(
        vocab_size=128, hidden_size=64, num_layers=1, num_heads=4,
        mlp_dim=64, max_tokens=16,
    )
    enc = NomicEncoder(cfg, matryoshka_dim=32)
    ids = np.ones((2, 16), dtype=np.int32)
    mask = np.ones((2, 16), dtype=np.int32)
    out = enc.encode_tokens(ids, mask)
    assert out.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-3)


def test_rotary_tables_shape():
    from better_search_rag_rust_tpu.models.nomic import rotary_tables

    cos, sin = rotary_tables(16, 8, 1000.0)
    assert cos.shape == (16, 4) and sin.shape == (16, 4)
    np.testing.assert_allclose(cos[0], 1.0)
    np.testing.assert_allclose(sin[0], 0.0)


def test_hf_param_conversion_roundtrip():
    """convert_hf_params maps a synthetic torch-layout state dict onto the
    module tree and the forward runs with it."""
    import jax.numpy as jnp

    from better_search_rag_rust_tpu.models.nomic import convert_hf_params

    cfg = NomicBertConfig(
        vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
        mlp_dim=32, max_tokens=8,
    )
    rng = np.random.default_rng(0)
    d, inner = cfg.hidden_size, cfg.mlp_dim

    def w(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    state = {
        "embeddings.word_embeddings.weight": w(cfg.vocab_size, d),
        "embeddings.token_type_embeddings.weight": w(2, d),
        "emb_ln.weight": np.ones(d, np.float32),
        "emb_ln.bias": np.zeros(d, np.float32),
        "encoder.layers.0.attn.Wqkv.weight": w(3 * d, d),
        "encoder.layers.0.attn.out_proj.weight": w(d, d),
        "encoder.layers.0.attn.out_proj.bias": np.zeros(d, np.float32),
        "encoder.layers.0.norm1.weight": np.ones(d, np.float32),
        "encoder.layers.0.norm1.bias": np.zeros(d, np.float32),
        "encoder.layers.0.norm2.weight": np.ones(d, np.float32),
        "encoder.layers.0.norm2.bias": np.zeros(d, np.float32),
        # fused GLU fc1 layout: [2*inner, d]
        "encoder.layers.0.mlp.fc1.weight": w(2 * inner, d),
        "encoder.layers.0.mlp.fc2.weight": w(d, inner),
        "encoder.layers.0.mlp.fc2.bias": np.zeros(d, np.float32),
    }
    params = convert_hf_params(state, cfg)
    assert params["layer_0"]["mlp"]["fc11"]["kernel"].shape == (d, inner)
    enc = NomicEncoder(cfg, params=params)
    out = enc.encode_tokens(
        np.ones((1, 8), np.int32), np.ones((1, 8), np.int32)
    )
    assert out.shape == (1, 16) and np.isfinite(out).all()


def test_flash_attention_matches_xla_interpret():
    """The Pallas flash-attention path (interpreted on CPU) must match the
    explicit XLA attention within bf16 tolerance, including key padding."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    cfg_x = NomicBertConfig(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        mlp_dim=128, max_tokens=128, attention_impl="xla",
    )
    enc_x = NomicEncoder(cfg_x, seed=3)
    cfg_f = dataclasses.replace(cfg_x, attention_impl="flash")
    enc_f = NomicEncoder(cfg_f, params=enc_x.params)

    rng = np.random.default_rng(5)
    ids = rng.integers(1, 256, size=(2, 128)).astype(np.int32)
    mask = np.ones((2, 128), np.int32)
    mask[0, 70:] = 0  # padded row exercises segment masking

    a = enc_x.encode_tokens(ids, mask)
    with pltpu.force_tpu_interpret_mode():
        b = enc_f.encode_tokens(ids, mask)
    cos = np.sum(a * b, axis=1)
    assert cos.min() > 0.999, cos


def test_fused_attention_matches_xla_interpret():
    """The fused rotary+attention Pallas kernel (the "auto" serving
    default; interpreted on CPU) must match the explicit XLA attention
    within bf16 tolerance, including key padding."""
    import dataclasses

    cfg_x = NomicBertConfig(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        mlp_dim=128, max_tokens=128, attention_impl="xla",
    )
    enc_x = NomicEncoder(cfg_x, seed=3)
    cfg_f = dataclasses.replace(cfg_x, attention_impl="fused")
    enc_f = NomicEncoder(cfg_f, params=enc_x.params)

    rng = np.random.default_rng(5)
    ids = rng.integers(1, 256, size=(2, 128)).astype(np.int32)
    mask = np.ones((2, 128), np.int32)
    mask[0, 70:] = 0  # padded keys must not contribute

    a = enc_x.encode_tokens(ids, mask)
    b = enc_f.encode_tokens(ids, mask)
    cos = np.sum(a * b, axis=1)
    assert cos.min() > 0.999, cos


def test_fused_attention_kernel_vs_einsum():
    """Kernel-level identity: fused_attention_qkv == the reference
    rotary + f32-logit einsum chain on the same operands (bf16 tolerance;
    padded QUERY rows excluded — they are finite garbage by contract)."""
    import math

    import jax
    import jax.numpy as jnp

    from better_search_rag_rust_tpu.models.nomic import (
        apply_rotary, rotary_tables)
    from better_search_rag_rust_tpu.ops.attention_pallas import (
        fused_attention_qkv, rotary_roll_tables)

    B, H, S, hd = 2, 4, 64, 64
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((B, S, 3, H, hd)).astype(np.float32),
        dtype=jnp.bfloat16)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    cos, sin = rotary_tables(S, hd, base=1000.0)
    mask = np.ones((B, S), np.int32)
    mask[1, 40:] = 0
    bias = jnp.asarray(np.where(mask, 0.0, -1e9).astype(np.float32))

    qr = apply_rotary(q, jnp.asarray(cos), jnp.asarray(sin))
    kr = apply_rotary(k, jnp.asarray(cos), jnp.asarray(sin))
    logits = jnp.einsum("bshd,bthd->bhst", qr, kr,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    logits = logits + bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
    ref = jnp.einsum("bhst,bthd->bshd", probs, v,
                     preferred_element_type=jnp.float32)

    c2, s2 = map(jnp.asarray, rotary_roll_tables(cos, sin))
    out = fused_attention_qkv(
        qkv.reshape(B, S, 3 * H * hd), c2, s2, bias, H,
        1.0 / math.sqrt(hd), interpret=True,
    ).reshape(B, S, H, hd)

    a = np.asarray(ref, np.float32)[:, :40]
    b = np.asarray(out, np.float32)[:, :40]
    cossim = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cossim > 0.999, cossim
    assert np.abs(a - b).max() < 0.02, np.abs(a - b).max()


def test_fused_attention_shape_guard_falls_back():
    """Non-8-aligned sequence lengths cannot take the fused kernel; the
    forward must silently fall back to xla_bf16 and still match the xla
    reference (the guard is in NomicAttention, models/nomic.py)."""
    import dataclasses

    cfg_f = NomicBertConfig(
        vocab_size=256, hidden_size=64, num_layers=1, num_heads=4,
        mlp_dim=128, max_tokens=30, attention_impl="fused",
    )
    enc_f = NomicEncoder(cfg_f, seed=7)
    cfg_x = dataclasses.replace(cfg_f, attention_impl="xla")
    enc_x = NomicEncoder(cfg_x, params=enc_f.params)

    ids = np.random.default_rng(1).integers(1, 256, size=(2, 30)).astype(np.int32)
    mask = np.ones((2, 30), np.int32)
    a = enc_f.encode_tokens(ids, mask)  # would crash if fused ran at S=30
    b = enc_x.encode_tokens(ids, mask)
    assert np.sum(a * b, axis=1).min() > 0.999


def test_fused_bwd_head_blocking_odd_heads():
    """The backward kernel's head-block sizing (hpb heads per grid step
    for Mosaic's 128-lane rule) must stay exact in the fallback arm too:
    an ODD head count with hd % 128 != 0 forces hpb=heads (no smaller
    divisor meets the lane rule), which is a different grid/liveness
    shape than production's hd=64/hpb=2. Grad must equal the autodiff of
    the same math regardless of blocking."""
    import math

    import jax
    import jax.numpy as jnp

    from better_search_rag_rust_tpu.ops.attention_pallas import (
        fused_attention_qkv, fused_attention_qkv_diff, rotary_roll_tables)

    B, S, H, HD = 4, 16, 3, 16  # hpb search: 16*h % 128 != 0 for h<=3
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.standard_normal((B, S, 3 * H * HD)), jnp.float32)
    bias = jnp.zeros((B, S), jnp.float32)
    ang = np.outer(np.arange(S), 1.0 / 1000.0 ** (np.arange(0, HD, 2) / HD))
    c2, s2 = rotary_roll_tables(
        jnp.asarray(np.cos(ang), jnp.float32),
        jnp.asarray(np.sin(ang), jnp.float32))
    scale = 1.0 / math.sqrt(HD)

    def loss_fused(q):
        return jnp.sum(
            fused_attention_qkv_diff(q, c2, s2, bias, H, scale, True) ** 2)

    def attn_jnp(q):
        """Pure-jnp replica of the kernel math (f32 inputs -> the
        kernel's astype(v.dtype) casts are identity here), so autodiff
        gives the exact reference gradient with no custom blocking."""
        outs = []
        for h in range(H):
            q0 = q[:, :, (0 * H + h) * HD:(0 * H + h + 1) * HD]
            k0 = q[:, :, (1 * H + h) * HD:(1 * H + h + 1) * HD]
            v = q[:, :, (2 * H + h) * HD:(2 * H + h + 1) * HD]
            qr = q0 * c2 + jnp.roll(q0, HD // 2, axis=-1) * s2
            kr = k0 * c2 + jnp.roll(k0, HD // 2, axis=-1) * s2
            logits = jnp.einsum("bsd,btd->bst", qr, kr) * scale
            logits = logits + bias[:, None, :]
            p = jax.nn.softmax(logits, axis=-1)
            outs.append(jnp.einsum("bst,btd->bsd", p, v))
        return jnp.concatenate(outs, axis=-1)

    # forward parity first (pins the replica to the kernel)
    fwd = fused_attention_qkv(qkv, c2, s2, bias, H, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(fwd, np.float64),
                               np.asarray(attn_jnp(qkv), np.float64),
                               rtol=1e-5, atol=1e-5)
    g_fused = jax.grad(loss_fused)(qkv)
    g_ref = jax.grad(lambda q: jnp.sum(attn_jnp(q) ** 2))(qkv)
    np.testing.assert_allclose(
        np.asarray(g_fused, np.float64), np.asarray(g_ref, np.float64),
        rtol=1e-4, atol=1e-4)


def test_fused_attention_gradients_match_xla():
    """The fused kernel's custom VJP (flash-style recompute backward) must
    produce parameter gradients matching the XLA attention's autodiff
    within bf16 tolerance (cosine per leaf > 0.99)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from better_search_rag_rust_tpu.models.nomic import NomicBertModel

    cfg_f = NomicBertConfig(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        mlp_dim=128, max_tokens=64, attention_impl="fused",
    )
    cfg_x = dataclasses.replace(cfg_f, attention_impl="xla")
    mf, mx = NomicBertModel(cfg_f), NomicBertModel(cfg_x)

    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(1, 256, size=(2, 64)), jnp.int32)
    mask = np.ones((2, 64), np.int32)
    mask[1, 40:] = 0
    mask = jnp.asarray(mask)
    params = mf.init(jax.random.PRNGKey(0), ids, mask)["params"]
    probe = jnp.asarray(rng.standard_normal((2, 64, 64)), jnp.float32)

    def loss(model):
        def f(p):
            h = model.apply({"params": p}, ids, mask).astype(jnp.float32)
            return jnp.sum(h * probe)
        return f

    gf = jax.grad(loss(mf))(params)
    gx = jax.grad(loss(mx))(params)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    checked = 0
    for path, leaf_f in flat_f:
        leaf_x = flat_x[path]
        a = np.asarray(leaf_f, np.float64).ravel()
        b = np.asarray(leaf_x, np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < 1e-6 and nb < 1e-6:
            continue
        cos = float(a @ b / (na * nb))
        assert cos > 0.99, (jax.tree_util.keystr(path), cos)
        checked += 1
    assert checked > 10  # all layers' weights actually compared


def test_classic_bert_gelu_backbone():
    """The gelu activation path (classic BERT family, no gating) runs and
    produces normalized embeddings — the framework supports both the
    NomicBERT (swiglu/rotary) and vanilla BERT block structure."""
    cfg = NomicBertConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
        mlp_dim=64, max_tokens=16, activation="gelu",
    )
    enc = NomicEncoder(cfg, seed=7)
    ids = np.random.default_rng(8).integers(1, 128, size=(3, 16)).astype(np.int32)
    mask = np.ones((3, 16), np.int32)
    out = enc.encode_tokens(ids, mask)
    assert out.shape == (3, 32)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-3)


def test_cli_profile_dir(tmp_path, capsys):
    """--profile-dir captures a device trace around the run."""
    from better_search_rag_rust_tpu.cli import main

    root = tmp_path / "src"
    root.mkdir()
    for i in range(3):
        (root / f"A{i}.java").write_text(f"class A{i} {{}}")
    trace_dir = tmp_path / "trace"
    rc = main([
        "run", "--root", str(root), "--store-dir", str(tmp_path / "st"),
        "--encoder-backend", "hash", "--dim", "32", "--max-tokens", "16",
        "--top-k", "2", "--encode-batch-size", "2",
        "--profile-dir", str(trace_dir),
    ])
    assert rc == 0
    assert trace_dir.exists()


def test_long_doc_mean_windows():
    """long_doc="mean": a document longer than max_tokens contributes ALL of
    its content (the reference silently drops everything past the cap)."""
    svc_trunc = create_encoder(
        EncoderConfig(backend="hash", dim=48, vocab_size=2048, max_tokens=16,
                      batch_size=4, long_doc="truncate")
    )
    svc_mean = create_encoder(
        EncoderConfig(backend="hash", dim=48, vocab_size=2048, max_tokens=16,
                      batch_size=4, long_doc="mean")
    )
    # exactly one full window (max_tokens - 2 = 14 words)
    head = "alpha beta gamma delta eta theta iota kappa lam mu nu xi omi pi "
    tail = "omega psi chi phi " * 10              # lives past the cap
    long_doc = head + tail

    t = svc_trunc.get_embeddings([long_doc, head])
    m = svc_mean.get_embeddings([long_doc, head])
    # truncate mode cannot see the tail: long doc == its head
    np.testing.assert_allclose(t[0], t[1], atol=1e-6)
    # mean mode sees the tail: long doc != its head
    assert not np.allclose(m[0], m[1], atol=1e-3)
    # short docs are unaffected by the mode
    np.testing.assert_allclose(t[1], m[1], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(m, axis=1), 1.0, rtol=1e-4)


def test_window_tokenizer_group_ids():
    tok = HashingTokenizer(vocab_size=512, max_tokens=8)
    ids, mask, groups = tok.encode_batch_windows(
        ["one two three four five six seven eight nine", "short"]
    )
    # 9 words / 6-word windows -> 2 windows + 1 window
    assert ids.shape == (3, 8)
    np.testing.assert_array_equal(groups, [0, 0, 1])
    assert (mask.sum(axis=1) >= 3).all()
    empty = tok.encode_batch_windows([])
    assert empty[0].shape == (0, 8)


def test_xla_bf16_attention_parity():
    import dataclasses

    cfg = NomicBertConfig(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        mlp_dim=128, max_tokens=64, attention_impl="xla",
    )
    enc = NomicEncoder(cfg, seed=11)
    enc_b = NomicEncoder(
        dataclasses.replace(cfg, attention_impl="xla_bf16"), params=enc.params
    )
    rng = np.random.default_rng(12)
    ids = rng.integers(1, 256, size=(3, 64)).astype(np.int32)
    mask = np.ones((3, 64), np.int32)
    mask[1, 40:] = 0
    a = enc.encode_tokens(ids, mask)
    b = enc_b.encode_tokens(ids, mask)
    cos = np.sum(a * b, axis=1)
    assert cos.min() > 0.999, cos


def test_staged_encode_matches_get_embeddings():
    """tokenize/dispatch/collect with several batches IN FLIGHT gives the
    same embeddings as the one-shot get_embeddings — the overlap the ingest
    pipeline relies on (collect lags dispatch by one batch)."""
    from better_search_rag_rust_tpu.models.encoder import create_encoder

    svc = create_encoder(EncoderConfig(backend="hash", dim=64, batch_size=4))
    batches = [
        [f"alpha doc {i} {j}" for j in range(5)] for i in range(3)
    ]
    want = [svc.get_embeddings(b) for b in batches]
    pendings = [svc.dispatch(svc.tokenize(b)) for b in batches]  # all queued
    for p, w in zip(pendings, want):
        np.testing.assert_array_equal(svc.collect(p), w)
    # empty batch contract survives the staged path
    empty = svc.collect(svc.dispatch(svc.tokenize([])))
    assert empty.shape == (0, 64)


def test_staged_encode_windows_mode():
    """The staged path reduces long_doc="mean" windows identically to the
    one-shot path."""
    from better_search_rag_rust_tpu.models.encoder import create_encoder

    svc = create_encoder(
        EncoderConfig(backend="hash", dim=32, batch_size=4,
                      max_tokens=16, long_doc="mean")
    )
    texts = ["word " * 100, "short", "medium " * 30]
    want = svc.get_embeddings(texts)
    got = svc.collect(svc.dispatch(svc.tokenize(texts)))
    np.testing.assert_array_equal(got, want)


def test_collect_many_matches_collect():
    """collect_many = one packed readback for a window of dispatches; the
    values must equal per-pending collect exactly (same buffers, same
    reduce), including empty batches and long-doc window pooling."""
    from better_search_rag_rust_tpu.models.encoder import create_encoder

    svc = create_encoder(EncoderConfig(backend="hash", dim=64, batch_size=4))
    batches = [
        [f"beta doc {i} {j}" for j in range(n)] for i, n in
        enumerate([5, 0, 3, 9])
    ]
    want = [svc.get_embeddings(b) for b in batches]
    pendings = [svc.dispatch(svc.tokenize(b)) for b in batches]
    got = svc.collect_many(pendings)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    # window-pooling mode rides the same packed path
    svc_w = create_encoder(
        EncoderConfig(backend="hash", dim=32, batch_size=4,
                      max_tokens=16, long_doc="mean")
    )
    wb = [["word " * 60, "short"], ["medium " * 20]]
    want_w = [svc_w.get_embeddings(b) for b in wb]
    got_w = svc_w.collect_many([svc_w.dispatch(svc_w.tokenize(b)) for b in wb])
    for g, w in zip(got_w, want_w):
        np.testing.assert_array_equal(g, w)

    # singleton window degrades to plain collect
    one = svc.collect_many([svc.dispatch(svc.tokenize(["solo text"]))])
    np.testing.assert_array_equal(one[0], svc.get_embeddings(["solo text"]))
