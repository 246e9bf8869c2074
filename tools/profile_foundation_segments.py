"""Stage-by-stage attribution of the FoundationStereo eval forward.

Unlike profile_foundation.py (which times standalone submodules with their
default configs), this binds ONE set of initialized variables and times each
stage of the real `__call__` sequence — so per-stage times sum to the full
forward and reflect the model's actual `conv3d_impl` / dtype configuration.

Usage: python tools/profile_foundation_segments.py [HxW] [vits|vitl]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stereo_toolbox_tpu.utils.timing import bench_fn

DTYPE = jnp.bfloat16


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "736x1280"
    vit = sys.argv[2] if len(sys.argv) > 2 else "vits"
    H, W = (int(v) for v in res.split("x"))
    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (1, H, W, 3), jnp.float32)
    right = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 3),
                              jnp.float32)

    from stereo_toolbox_tpu import ops
    from stereo_toolbox_tpu.models.foundation_stereo import FoundationStereo
    from stereo_toolbox_tpu.models.igev_stereo import combined_geo_lookup
    from stereo_toolbox_tpu.models.selective import _cam_sam_context
    from stereo_toolbox_tpu.ops.corr import (band_d_max, band_offsets,
                                             build_corr_band_pyramid,
                                             build_volume_pyramid)

    model = FoundationStereo(vit_size=vit, dtype=DTYPE)
    variables = jax.jit(model.init, static_argnames="train")(
        key, left, right, train=False)
    params = {k: v for k, v in variables.items()}

    def t(name, fn, *args):
        fn = jax.jit(fn)
        out = fn(*args)
        dt = bench_fn(fn, args)
        print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
        return out

    b, h4, w4 = 1, H // 4, W // 4
    d4 = model.max_disp // 4
    dt = DTYPE

    def scoped(path, fn_name="__call__"):
        """Apply a submodule by its variable path with the parent's weights."""
        def apply(method, *args, **kw):
            sub = {c: v
                   for c, v in (("params", params["params"].get(path)),
                                ("batch_stats",
                                 params.get("batch_stats", {}).get(path)))
                   if v is not None}
            mod = method.__self__ if hasattr(method, "__self__") else None
            return sub, mod
        return apply

    # stage 1: features
    both = jnp.concatenate([left, right], 0)
    from stereo_toolbox_tpu.models.foundation_stereo import (
        ContextNetDino, FSFeature, FSHourglass, ResnetBlock, _FSStep)
    from stereo_toolbox_tpu.nn.igev_blocks import BasicConvBN, BasicConvIN
    from stereo_toolbox_tpu.nn.layers import Conv3dFlex, FeatureAtt
    import flax.linen as nn

    feat_mod = FSFeature(vit, dtype=dt)
    fv = {"params": params["params"]["feature"]}
    feats_vit = t("feature (trunk+dino, both views)",
                  lambda v, x: feat_mod.apply(v, x, x), fv, both)
    feats, vit_feat = feats_vit
    fl = [f[:b] for f in feats]
    fr0 = feats[0][b:]
    vit_feat = vit_feat[:b]

    # stem (tiny) — measured as part of 'rest'
    gwc = t("build_gwc_volume_cosine",
            lambda a, c: ops.build_gwc_volume_cosine(a, c, d4,
                                                     model.cv_group),
            fl[0], fr0)

    # corr_stem: run the model's exact modules
    def corr_stem(p, gwc, f0, fr):
        proj = nn.Conv(12, (1, 1), dtype=dt, name="proj_cmb")
        cvol = ops.build_concat_volume(
            proj.apply({"params": p["proj_cmb"]}, f0),
            proj.apply({"params": p["proj_cmb"]}, fr), d4, mask_left=False)
        comb = jnp.concatenate([gwc, cvol], -1)
        m0 = nn.Conv(model.volume_dim, (1, 1, 1), dtype=dt)
        comb = m0.apply({"params": p["corr_stem_0"]}, comb)
        m1 = BasicConvBN(model.volume_dim, 3, 1, conv3d_impl="via2d",
                         dtype=dt)
        comb = m1.apply({"params": p["corr_stem_1"],
                         "batch_stats":
                         params["batch_stats"]["corr_stem_1"]}, comb, False)
        for nm in ("corr_stem_2", "corr_stem_3"):
            m = ResnetBlock(model.volume_dim, conv3d_impl="via2d", dtype=dt)
            comb = m.apply({"params": p[nm],
                            "batch_stats": params["batch_stats"][nm]},
                           comb, False)
        m = FeatureAtt(model.volume_dim, dtype=dt)
        comb = m.apply({"params": p["corr_feature_att"],
                        "batch_stats":
                        params["batch_stats"].get("corr_feature_att", {})},
                       comb, f0, False)
        return comb
    comb = t("proj+concat_volume+corr_stem+featatt",
             corr_stem, params["params"], gwc, fl[0], fr0)

    hg = FSHourglass(model.volume_dim, model.max_disp, conv3d_impl="via2d",
                     dtype=dt)
    hgv = {"params": params["params"]["cost_agg"],
           "batch_stats": params["batch_stats"]["cost_agg"]}
    gev = t("hourglass (via2d, in-model cfg)",
            lambda v, x, f: hg.apply(v, x, f, False), hgv, comb, fl)

    # hourglass sub-stage attribution (fresh-init weights, same shapes)
    from stereo_toolbox_tpu.models.foundation_stereo import (
        Conv3dNormActReduced, CostVolumeDisparityAttention)
    f28 = model.volume_dim
    hx = comb
    for nm, mod, args in (
        ("  hg conv1_0 (3^3 s2 28->56)",
         BasicConvBN(f28 * 2, 3, 2, conv3d_impl="via2d", dtype=dt),
         (comb,)),
    ):
        mv0 = mod.init(key, *args, False)
        t(nm, lambda v, x, m=mod: m.apply(v, x, False), mv0, *args)
    c1 = jax.random.normal(key, (b, d4 // 2, h4 // 2, w4 // 2, f28 * 2), dt)
    m = Conv3dNormActReduced(f28 * 2, conv3d_impl="via2d", dtype=dt)
    mv0 = m.init(key, c1, False)
    t("  hg reduced conv @1/8 56ch", lambda v, x: m.apply(v, x, False),
      mv0, c1)
    c2s = jax.random.normal(key, (b, d4 // 4, h4 // 4, w4 // 4, f28 * 4), dt)
    m2 = Conv3dNormActReduced(f28 * 4, conv3d_impl="via2d", dtype=dt)
    mv2 = m2.init(key, c2s, False)
    t("  hg reduced conv @1/16 112ch", lambda v, x: m2.apply(v, x, False),
      mv2, c2s)
    mo = Conv3dNormActReduced(f28, conv3d_impl="via2d", dtype=dt)
    mvo = mo.init(key, comb, False)
    t("  hg conv_out reduced @1/4 28ch", lambda v, x: mo.apply(v, x, False),
      mvo, comb)
    patch = jax.random.normal(key, (b, d4 // 4, h4 // 4, w4 // 4, f28), dt)
    ma = CostVolumeDisparityAttention(f28, 4, 4, max_len=model.max_disp // 16,
                                      dtype=dt)
    mva = jax.jit(ma.init)(key, patch)
    t("  hg disparity attention", lambda v, x: ma.apply(v, x), mva, patch)
    mup = BasicConvBN(f28, 4, 2, deconv=True, dtype=dt)
    c1f = jax.random.normal(key, (b, d4 // 2, h4 // 2, w4 // 2, f28 * 2), dt)
    mvu = mup.init(key, c1f, False)
    t("  hg conv1_up deconv 56->28", lambda v, x: mup.apply(v, x, False),
      mvu, c1f)

    def classifier(p, gev):
        m0 = BasicConvBN(model.volume_dim // 2, 3, 1, conv3d_impl="via2d",
                         dtype=dt)
        cls = m0.apply({"params": p["classifier_0"],
                        "batch_stats": params["batch_stats"]["classifier_0"]},
                       gev, False)
        m1 = ResnetBlock(model.volume_dim // 2, conv3d_impl="via2d", dtype=dt)
        cls = m1.apply({"params": p["classifier_1"],
                        "batch_stats": params["batch_stats"]["classifier_1"]},
                       cls, False)
        m2 = Conv3dFlex(1, (7, 7, 7), padding=(3, 3, 3), use_bias=True,
                        impl="via2d", dtype=dt)
        cls = m2.apply({"params": p["classifier_2"]}, cls)
        prob = jax.nn.softmax(cls[..., 0].astype(jnp.float32), 1)
        return ops.disparity_regression(prob, d4)
    init_disp = t("classifier stack + regression", classifier,
                  params["params"], gev)

    cn = ContextNetDino(dtype=dt)
    vf4 = vit_feat if vit_feat.shape[1:3] == (h4, w4) else \
        ops.interpolate(vit_feat, (h4, w4), (1, 2), align_corners=True)
    cnet_out = t("cnet", lambda v, x, f: cn.apply(v, x, f, False),
                 {"params": params["params"]["cnet"],
                  "batch_stats": params["batch_stats"]["cnet"]}, left, vf4)

    class _CamSam(nn.Module):
        @nn.compact
        def __call__(self, cnet_out):
            return _cam_sam_context(cnet_out, dt)
    cs = _CamSam()
    csv = jax.jit(cs.init)(key, cnet_out)
    nets, inps, atts = t("cam/sam context split",
                         lambda v, c: cs.apply(v, c), csv, cnet_out)

    lkdt = dt
    geo_pyr = t("geo pyramid (cast+pool)",
                lambda g: tuple(build_volume_pyramid(
                    jnp.moveaxis(g, 1, 3).astype(lkdt), model.corr_levels)),
                gev)

    db = band_d_max(d4, w4)
    m4 = max(model.band_margin // 4, 1)
    boffs = band_offsets(model.corr_levels, db, model.corr_radius, m4)

    def corr_bands(f0, fr):
        fln = f0.astype(jnp.float32)
        fln = fln / (jnp.linalg.norm(fln, axis=-1, keepdims=True) + 1e-12)
        frn = fr.astype(jnp.float32)
        frn = frn / (jnp.linalg.norm(frn, axis=-1, keepdims=True) + 1e-12)
        pyr = build_corr_band_pyramid(fln.astype(lkdt), frn.astype(lkdt),
                                      model.corr_levels, db,
                                      model.corr_radius, m4, normalize=False)
        return tuple(c.astype(lkdt) for c in pyr)
    corr_pyr = t("corr band pyramid (bf16)", corr_bands, fl[0], fr0)

    x0 = jnp.broadcast_to(jnp.arange(w4, dtype=jnp.float32)[None, None, :],
                          (b, h4, w4))
    t("combined_geo_lookup (per iter)",
      lambda g, c, d: combined_geo_lookup(g, c, d, x0, model.corr_radius,
                                          boffs),
      geo_pyr, corr_pyr, init_disp)

    # stem_2x for the step
    def stem2(p, left):
        s2 = BasicConvIN(32, 3, 2, dtype=dt)
        x = s2.apply({"params": p["stem_2_0"]}, left)
        c = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=dt)
        x = c.apply({"params": p["stem_2_1"]}, x)
        g = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                         use_scale=False, epsilon=1e-5, dtype=dt)
        return nn.relu(g.apply({"params": {}}, x))
    stem_2x = t("stem_2x", stem2, params["params"], left)

    step = _FSStep(model.hidden_dims, model.n_gru_layers, model.corr_radius,
                   band_offs=boffs, skip_unemitted=True, dtype=dt)
    sv = {"params": params["params"]["step"],
          "batch_stats": params["batch_stats"].get("step", {})}
    t("scan step (skip iter)",
      lambda v, c, e: step.apply(v, c, e, geo_pyr, corr_pyr, inps, atts,
                                 x0, stem_2x),
      sv, (nets, init_disp), jnp.array(False))
    t("scan step (emit iter)",
      lambda v, c, e: step.apply(v, c, e, geo_pyr, corr_pyr, inps, atts,
                                 x0, stem_2x),
      sv, (nets, init_disp), jnp.array(True))

    mv = variables
    t("FULL fwd iters=32",
      lambda v, a, c: model.apply(v, a, c, train=False, iters=32,
                                  mutable=["batch_stats"])[0],
      mv, left, right)


if __name__ == "__main__":
    main()
