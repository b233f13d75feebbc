"""BERT text encoder (flax) + language module.

TPU-native replacement for `models/lang_bert_module/` (lang_bert_module.py
+ the vendored ALBEF-style xbert.py). The reference runs
`bert-base-uncased` in "text mode" — only the first `fusion_layer` of the
12 encoder layers (xbert.py:550-558; the missing config_bert.json follows
the ALBEF default fusion_layer=6) — then projects 768 -> 128, takes the
CLS embedding, and classifies the referred object class
(lang_bert_module.py:98-140). The text encoder is entirely frozen
(init loop sets requires_grad=False for every BERT param,
lang_bert_module.py:84-95) — here freezing is a stop_gradient on the
encoder output, which blocks all gradients into BERT params and skips
their backward compute.

Parameter layout matches HF bert-base-uncased so real weights can be
imported with ``load_hf_bert_params`` (weights are an external asset, as
in the reference).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    fusion_layer: int = 6  # text mode runs layers [0, fusion_layer)


def distilbert_config() -> "BertConfig":
    """DistilBERT-base-uncased: 6 layers, no token-type embeddings
    (type_vocab_size=0 skips them); text mode runs ALL layers — the
    reference's distil path calls the full distilbert forward
    (lang_bert_module.py:99-101)."""
    return BertConfig(
        num_hidden_layers=6, fusion_layer=6, type_vocab_size=0
    )


class BertEmbeddings(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, *, deterministic=True):
        c = self.config
        seq = input_ids.shape[-1]
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(
            input_ids
        )
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, name="position_embeddings"
        )(jnp.arange(seq)[None, :])
        x = word + pos
        if c.type_vocab_size:  # DistilBERT has no token-type embeddings
            x = x + nn.Embed(
                c.type_vocab_size, c.hidden_size, name="token_type_embeddings"
            )(jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="LayerNorm")(x)
        return nn.Dropout(c.hidden_dropout)(x, deterministic=deterministic)


class BertLayer(nn.Module):
    config: BertConfig
    causal: bool = False  # decoder self-attention (xbert.py:883-918)
    # ffn=False yields just the self-attention sublayer (attention +
    # output dense + residual LayerNorm) — used by BertFusionLayer, where
    # the FFN runs AFTER cross-attention (xbert.py:458-516)
    ffn: bool = True

    @nn.compact
    def __call__(self, x, attention_mask, *, deterministic=True):
        c = self.config
        h = c.num_attention_heads
        dk = c.hidden_size // h
        b, s, _ = x.shape

        q = nn.Dense(c.hidden_size, name="query")(x)
        k = nn.Dense(c.hidden_size, name="key")(x)
        v = nn.Dense(c.hidden_size, name="value")(x)
        q = q.reshape(b, s, h, dk).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, dk).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, dk).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(dk))
        att = att + (1.0 - attention_mask[:, None, None, :]) * -10000.0
        if self.causal:
            tri = jnp.tril(jnp.ones((s, s), jnp.float32))
            att = att + (1.0 - tri)[None, None] * -10000.0
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(c.attention_dropout)(att, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, c.hidden_size)
        ctx = nn.Dense(c.hidden_size, name="attention_output")(ctx)
        ctx = nn.Dropout(c.hidden_dropout)(ctx, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_LayerNorm")(
            x + ctx
        )
        if not self.ffn:
            return x

        y = nn.Dense(c.intermediate_size, name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c.hidden_size, name="output")(y)
        y = nn.Dropout(c.hidden_dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_LayerNorm")(
            x + y
        )


class BertFusionLayer(nn.Module):
    """Encoder layer with cross-attention (the ALBEF-style fusion layers,
    xbert.py: layers [fusion_layer, num_hidden_layers) in 'fusion' /
    'multi_modal' mode). Sublayer order matches xbert.py:458-516 exactly:
    self-attention -> cross-attention -> feed-forward, each with its own
    residual LayerNorm (the FFN consumes the CROSS-attention output).
    causal=True makes it a BertLMHeadModel-style decoder layer.
    Verified against the vendored xbert in tests/test_refparity_xbert.py."""

    config: BertConfig
    causal: bool = False

    @nn.compact
    def __call__(self, x, attention_mask, encoder_states, encoder_mask=None,
                 *, deterministic=True):
        c = self.config
        h = c.num_attention_heads
        dk = c.hidden_size // h
        b, s, _ = x.shape

        # self-attention sublayer only (ffn=False); the FFN runs after
        # cross-attention below
        x = BertLayer(self.config, causal=self.causal, ffn=False,
                      name="self")(
            x, attention_mask, deterministic=deterministic
        )
        t = encoder_states.shape[1]
        q = nn.Dense(c.hidden_size, name="xq")(x).reshape(b, s, h, dk)
        k = nn.Dense(c.hidden_size, name="xk")(encoder_states).reshape(
            b, t, h, dk
        )
        v = nn.Dense(c.hidden_size, name="xv")(encoder_states).reshape(
            b, t, h, dk
        )
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(jnp.float32(dk))
        if encoder_mask is not None:
            att = att + (1.0 - encoder_mask[:, None, None, :]) * -10000.0
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(c.attention_dropout)(att, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, c.hidden_size)
        ctx = nn.Dense(c.hidden_size, name="xout")(ctx)
        ctx = nn.Dropout(c.hidden_dropout)(ctx, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="xln")(x + ctx)

        y = nn.Dense(c.intermediate_size, name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c.hidden_size, name="output")(y)
        y = nn.Dropout(c.hidden_dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_LayerNorm")(
            x + y
        )


class BertTextEncoder(nn.Module):
    """Embeddings + encoder with xbert's modes (xbert.py:550-558):
    'text' runs layers [0, fusion_layer); 'fusion' runs
    [fusion_layer, num_hidden_layers) with cross-attention;
    'multi_modal' runs both."""

    config: BertConfig = BertConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask, *, deterministic=True,
                 mode: str = "text", encoder_states=None, encoder_mask=None,
                 hidden_states=None):
        c = self.config
        mask = attention_mask.astype(jnp.float32)
        if mode in ("text", "multi_modal"):
            x = BertEmbeddings(self.config, name="embeddings")(
                input_ids, deterministic=deterministic
            )
            for i in range(c.fusion_layer):
                x = BertLayer(self.config, name=f"layer_{i}")(
                    x, mask, deterministic=deterministic
                )
        else:
            x = hidden_states
        if mode in ("fusion", "multi_modal"):
            for i in range(c.fusion_layer, c.num_hidden_layers):
                x = BertFusionLayer(self.config, name=f"layer_{i}")(
                    x, mask, encoder_states, encoder_mask,
                    deterministic=deterministic,
                )
        return x


class BertMLMHead(nn.Module):
    """BertForMaskedLM prediction head (dense + GELU + LN + vocab decoder)."""

    config: BertConfig = BertConfig()

    @nn.compact
    def __call__(self, hidden):
        c = self.config
        x = nn.Dense(c.hidden_size, name="transform")(hidden)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln")(x)
        return nn.Dense(c.vocab_size, name="decoder")(x)


class LangModule(nn.Module):
    """BERT text mode -> 768->128 projection, CLS embedding, lang classifier
    (lang_bert_module.py:98-140)."""

    num_class: int = 18
    lang_hidden_size: int = 128
    use_lang_classifier: bool = True
    bert_config: BertConfig = BertConfig()
    freeze_bert: bool = True

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,  # (B, L, T) i32
        attention_mask: jax.Array,  # (B, L, T)
        *,
        train: bool = False,
    ):
        b, l, t = input_ids.shape
        ids = input_ids.reshape(b * l, t)
        amask = attention_mask.reshape(b * l, t)

        hidden = BertTextEncoder(self.bert_config, name="text_encoder")(
            ids, amask, deterministic=not train
        )
        if self.freeze_bert:
            hidden = jax.lax.stop_gradient(hidden)

        lang_fea = nn.Dense(self.lang_hidden_size, name="proj")(hidden)
        lang_emb = lang_fea[:, 0, :]  # CLS

        out = {
            "lang_fea": lang_fea,  # (B*L, T, 128)
            "lang_emb": lang_emb,  # (B*L, 128)
            "lang_mask": amask,  # (B*L, T)
        }
        if self.use_lang_classifier:
            scores = nn.Dense(self.num_class, name="lang_cls")(lang_emb)
            out["lang_scores"] = nn.Dropout(0.5)(
                scores, deterministic=not train
            )
        return out


class LangCrossMLM(nn.Module):
    """Proposal-conditioned MLM head — the reference's dormant
    LangBertModule.mlm (lang_bert_module.py:142-249; invoked nowhere in
    the joint path, where forward_mlm on the caption decoder is the wired
    MLM). Per scene row: sample ONE sentence uniformly from the flattened
    (B*L) pool (:168-170), 80/10/10-mask it excluding pad/CLS
    (mask(), :251-276), re-encode with the text encoder, run `depth`
    cross-attention blocks against the sampled scene's positive-proposal
    features (pc_proj Linear+GELU, :50-53; mul-way attention, :219-221),
    and score every position with a prediction head (:247)."""

    depth: int = 2
    heads: int = 4
    hidden_size: int = 128
    mask_ratio: float = 0.15
    bert_config: BertConfig = BertConfig()
    freeze_bert: bool = True

    @nn.compact
    def __call__(
        self,
        rng: jax.Array,
        input_ids: jax.Array,  # (B, L, T) i32
        attention_mask: jax.Array,  # (B, L, T)
        bbox_feature: jax.Array,  # (B, K, H) relation output
        positive_labels: jax.Array,  # (B, L) best-IoU proposal per sentence
        *,
        train: bool = False,
    ):
        from vlp3d.models.attention import MultiHeadAttention, PredictionHead
        from vlp3d.models.caption import mask_caption_tokens

        b, l, t = input_ids.shape
        # per-sentence positive proposal feature (select, :77-86)
        sel = jnp.take_along_axis(
            bbox_feature,
            positive_labels.reshape(b, l)[..., None].astype(jnp.int32),
            axis=1,
        )  # (B, L, H)

        r_sample, r_mask = jax.random.split(rng)
        sample_ids = jax.random.randint(r_sample, (b,), 0, b * l)
        ids_flat = input_ids.reshape(b * l, t)
        am_flat = attention_mask.reshape(b * l, t)
        sample_tok = ids_flat[sample_ids]  # (B, T)
        sample_am = am_flat[sample_ids]
        sample_scenes = sample_ids // l
        memory = sel[sample_scenes]  # (B, L, H)

        mlm_ids, masked = mask_caption_tokens(
            r_mask, sample_tok, self.bert_config.vocab_size, self.mask_ratio
        )

        hidden = BertTextEncoder(self.bert_config, name="text_encoder")(
            mlm_ids, sample_am, deterministic=not train
        )
        if self.freeze_bert:
            hidden = jax.lax.stop_gradient(hidden)
        x = nn.Dense(self.hidden_size, name="proj")(hidden)  # (B, T, H)

        mem = nn.Dense(self.hidden_size, name="pc_proj")(memory)
        mem = nn.gelu(mem, approximate=False)
        for i in range(self.depth):
            x = MultiHeadAttention(
                self.hidden_size, self.heads, name=f"cross_attn_{i}"
            )(x, mem, mem, way="mul", deterministic=not train)
        logits = PredictionHead(
            self.bert_config.vocab_size, self.hidden_size, name="prediction"
        )(x)
        return logits, sample_tok, masked


def cross_mlm_loss(
    logits: jax.Array,  # (B, T, V)
    targets: jax.Array,  # (B, T) original ids
    masked: jax.Array,  # (B, T) bool — loss only on masked positions
) -> jax.Array:
    """CE over masked positions (the reference's CrossEntropyLoss with
    -100-filled unmasked targets, lang_bert_module.py:247-249)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    n = jnp.maximum(masked.sum(), 1)
    return jnp.where(masked, nll, 0.0).sum() / n


def load_hf_bert_params(flax_params: dict, state_dict: dict) -> dict:
    """Copy HF bert-base-uncased torch weights into BertTextEncoder params.

    `state_dict` maps HF names (bert.embeddings..., bert.encoder.layer.N...)
    to numpy arrays. Returns a new params dict (linen kernel layout:
    torch Linear weight (out, in) -> kernel (in, out)).
    """
    import numpy as np

    p = jax.tree_util.tree_map(lambda x: x, flax_params)  # shallow copy

    def put(path, value):
        node = p
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = jnp.asarray(value)

    def g(name):
        key = name if name in state_dict else "bert." + name
        return np.asarray(state_dict[key])

    emb = ["text_encoder", "embeddings"]
    put(emb + ["word_embeddings", "embedding"], g("embeddings.word_embeddings.weight"))
    put(emb + ["position_embeddings", "embedding"], g("embeddings.position_embeddings.weight"))
    put(emb + ["token_type_embeddings", "embedding"], g("embeddings.token_type_embeddings.weight"))
    put(emb + ["LayerNorm", "scale"], g("embeddings.LayerNorm.weight"))
    put(emb + ["LayerNorm", "bias"], g("embeddings.LayerNorm.bias"))

    n_layers = sum(
        1 for k in flax_params["text_encoder"] if k.startswith("layer_")
    )
    for i in range(n_layers):
        src = f"encoder.layer.{i}."
        dst = ["text_encoder", f"layer_{i}"]
        pairs = [
            ("query", "attention.self.query"),
            ("key", "attention.self.key"),
            ("value", "attention.self.value"),
            ("attention_output", "attention.output.dense"),
            ("intermediate", "intermediate.dense"),
            ("output", "output.dense"),
        ]
        for name, hf in pairs:
            put(dst + [name, "kernel"], g(src + hf + ".weight").T)
            put(dst + [name, "bias"], g(src + hf + ".bias"))
        put(dst + ["attention_LayerNorm", "scale"], g(src + "attention.output.LayerNorm.weight"))
        put(dst + ["attention_LayerNorm", "bias"], g(src + "attention.output.LayerNorm.bias"))
        put(dst + ["output_LayerNorm", "scale"], g(src + "output.LayerNorm.weight"))
        put(dst + ["output_LayerNorm", "bias"], g(src + "output.LayerNorm.bias"))
    return p


def load_hf_distilbert_params(flax_params: dict, state_dict: dict) -> dict:
    """Copy HF distilbert-base-uncased torch weights into BertTextEncoder
    params built with distilbert_config(). A DistilBERT layer is the same
    post-LN block as a BERT layer under renamed tensors
    (q_lin/k_lin/v_lin/out_lin, sa_layer_norm, ffn.lin1/lin2,
    output_layer_norm); embeddings carry no token-type table."""
    import numpy as np

    p = jax.tree_util.tree_map(lambda x: x, flax_params)

    def put(path, value):
        node = p
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = jnp.asarray(value)

    def g(name):
        key = name if name in state_dict else "distilbert." + name
        return np.asarray(state_dict[key])

    emb = ["text_encoder", "embeddings"]
    put(emb + ["word_embeddings", "embedding"], g("embeddings.word_embeddings.weight"))
    put(emb + ["position_embeddings", "embedding"], g("embeddings.position_embeddings.weight"))
    put(emb + ["LayerNorm", "scale"], g("embeddings.LayerNorm.weight"))
    put(emb + ["LayerNorm", "bias"], g("embeddings.LayerNorm.bias"))

    n_layers = sum(
        1 for k in flax_params["text_encoder"] if k.startswith("layer_")
    )
    for i in range(n_layers):
        src = f"transformer.layer.{i}."
        dst = ["text_encoder", f"layer_{i}"]
        pairs = [
            ("query", "attention.q_lin"),
            ("key", "attention.k_lin"),
            ("value", "attention.v_lin"),
            ("attention_output", "attention.out_lin"),
            ("intermediate", "ffn.lin1"),
            ("output", "ffn.lin2"),
        ]
        for name, hf in pairs:
            put(dst + [name, "kernel"], g(src + hf + ".weight").T)
            put(dst + [name, "bias"], g(src + hf + ".bias"))
        put(dst + ["attention_LayerNorm", "scale"], g(src + "sa_layer_norm.weight"))
        put(dst + ["attention_LayerNorm", "bias"], g(src + "sa_layer_norm.bias"))
        put(dst + ["output_LayerNorm", "scale"], g(src + "output_layer_norm.weight"))
        put(dst + ["output_LayerNorm", "bias"], g(src + "output_layer_norm.bias"))
    return p
