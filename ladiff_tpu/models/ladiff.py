"""LADiff system: two-stage (VAE / latent-diffusion) text-to-motion model.

TPU-native rebuild of the reference orchestrator
/root/reference/src/ladiff/models/modeltype/ladiff.py:27-1489 (a PyTorch
LightningModule).  Here the orchestrator is a thin, stateless composition
layer: it owns module *definitions* and static hyperparameters, and exposes
pure functions (params, batch, rng) -> outputs that the trainer jits over a
device mesh.  Key path mapping:

  reference                          ->  here
  train_vae_forward (:815)               vae_forward
  train_diffusion_forward (:874)         diffusion_forward
  _diffusion_process (:745)              diffusion_forward (noising inline)
  _diffusion_reverse (:333)              diffusion_reverse (lax.scan DDIM)
  forward / demo path (:250)             generate
  feats2joints (datamodule)              feats2joints (denorm + RIC recover)

Text conditioning arrives as precomputed frozen-CLIP pooled features
([B, 1, 768]); caption dropout for classifier-free guidance replaces a
sample's embedding with the empty-string embedding (reference drops the
caption string itself at ladiff.py:919-923 — identical effect, but jittable).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ladiff_tpu.data.humanml.motion_repr import recover_from_ric
from ladiff_tpu.diffusion.sampling import ddim_sample, make_cfg_denoise_fn
from ladiff_tpu.diffusion.schedulers import DiffusionSchedule, make_schedule
from ladiff_tpu.losses.mld import LossWeights, diffusion_loss, vae_loss
from ladiff_tpu.models.denoiser import LADenoiser
from ladiff_tpu.models.vae import LAVae
from ladiff_tpu.transforms.rotation2xyz import Rotation2xyz
from ladiff_tpu.utils.masks import latent_valid_mask, lengths_to_mask

__all__ = ["LADiffSystem"]


def _mod_layers(m, key):
    """Per-module num_layers from the merged module yaml (None if absent)."""
    v = ((m.get(key) or {}).get("params") or {}).get("num_layers")
    return int(v) if v is not None else None


@dataclasses.dataclass
class LADiffSystem:
    nfeats: int
    njoints: int
    max_frames: int = 196
    latent_dim: Tuple[int, int] = (7, 256)
    ff_size: int = 1024
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    max_it: int = 5
    frame_per_latent: int = 48
    lad: bool = True
    dvae: bool = False
    percentage_noised: float = 0.0
    md_trans: bool = True
    mlp_dist: bool = False
    test_efficiency: bool = False
    text_encoded_dim: int = 768
    guidance_scale: float = 7.5
    guidance_uncondp: float = 0.1
    predict_epsilon: bool = True
    num_inference_timesteps: int = 50
    eta: float = 0.0
    num_train_timesteps: int = 1000
    # "ddim" | "ddpm" — the reference selects via the diffusers scheduler
    # class in modules*/scheduler.yaml (novae ships DDPMScheduler)
    scheduler_kind: str = "ddim"
    # per-tower depth overrides (reference families size the towers via
    # modules_*/{motion_vae,denoiser}.yaml, e.g. humanact12: 6-layer
    # ActorVae + 15-layer denoiser); None = shared num_layers
    vae_num_layers: Optional[int] = None
    denoiser_num_layers: Optional[int] = None
    ardiff: bool = False
    motion_conditioning: str = "last"
    condition: str = "text"
    nclasses: int = 12
    vae_type: str = "ladiff"
    weights: LossWeights = dataclasses.field(default_factory=LossWeights)
    # feature normalization stats (set by the datamodule)
    mean: Optional[jnp.ndarray] = None
    std: Optional[jnp.ndarray] = None
    # SMPL forward pass for the action path (reference ladiff.py:151-173
    # builds Rotation2xyz from cfg.DATASET.SMPL_PATH when condition='action')
    rot2xyz: Optional[Rotation2xyz] = None
    dtype: Any = jnp.float32

    # ------------------------------------------------------------------
    @classmethod
    def from_cfg(cls, cfg, nfeats: int, njoints: int,
                 mean=None, std=None, dtype=jnp.float32) -> "LADiffSystem":
        abl = cfg.TRAIN.ABLATION
        m = cfg.model
        sched = m.get("scheduler", {})
        return cls(
            nfeats=nfeats,
            njoints=njoints,
            max_frames=int(cfg.DATASET.SAMPLER.MAX_LEN),
            latent_dim=tuple(m.latent_dim),
            ff_size=int(m.ff_size),
            num_layers=int(m.num_layers),
            num_heads=int(m.num_head),
            dropout=float(m.droupout),  # sic: reference key spelling
            # .get defaults: reference family configs (e.g. novae) omit
            # these keys entirely when the VAE tower is unused
            max_it=int(abl.get("MAX_IT", 5)),
            frame_per_latent=int(abl.get("FRAME_PER_LATENT", 48)),
            lad=bool(abl.get("LAD", True)),
            dvae=bool(abl.get("DVAE", False)),
            percentage_noised=float(abl.get("PERCENTAGE_NOISED", 0.0)),
            md_trans=bool(abl.get("MD_TRANS", False)),
            mlp_dist=bool(abl.get("MLP_DIST", False)),
            test_efficiency=bool(abl.get("TEST_EFFICIENCY", False)),
            text_encoded_dim=int(
                ((m.get("denoiser") or {}).get("params") or {})
                .get("text_encoded_dim", 768)),
            guidance_scale=float(m.guidance_scale),
            guidance_uncondp=float(m.guidance_uncondp),
            predict_epsilon=bool(abl.get("PREDICT_EPSILON", True)),
            num_inference_timesteps=int(sched.get("num_inference_timesteps", 50)),
            eta=float(sched.get("eta", 0.0)),
            num_train_timesteps=int(
                (sched.get("params") or {}).get("num_train_timesteps", 1000)),
            scheduler_kind=str(
                sched.get("kind", "")
                or ("ddpm" if "DDPM" in str(sched.get("target", ""))
                    else "ddim")),
            ardiff=bool(cfg.get("ARDIFF", False)),
            motion_conditioning=str(m.get("motion_conditioning", "last")),
            condition=str(m.get("condition", "text")),
            nclasses=int(cfg.DATASET.get("NCLASSES", 12)),
            vae_type=str(cfg.TRAIN.ABLATION.get("VAE_TYPE", "ladiff")),
            vae_num_layers=_mod_layers(m, "motion_vae"),
            denoiser_num_layers=_mod_layers(m, "denoiser"),
            weights=LossWeights.from_cfg(cfg),
            mean=None if mean is None else jnp.asarray(mean),
            std=None if std is None else jnp.asarray(std),
            rot2xyz=(Rotation2xyz.from_path(
                str(cfg.DATASET.get("SMPL_PATH", "./deps/smpl_models/smpl")))
                if str(m.get("condition", "text")) == "action" else None),
            dtype=dtype,
        )

    # -- module definitions --------------------------------------------
    @property
    def vae(self):
        if self.vae_type == "actor":
            from ladiff_tpu.models.actor_vae import ActorVae
            return ActorVae(
                nfeats=self.nfeats, latent_dim=self.latent_dim,
                ff_size=self.ff_size,
                num_layers=self.vae_num_layers or self.num_layers,
                num_heads=self.num_heads, dropout=self.dropout,
                dtype=self.dtype)
        return LAVae(
            nfeats=self.nfeats, latent_dim=self.latent_dim,
            ff_size=self.ff_size,
            num_layers=self.vae_num_layers or self.num_layers,
            num_heads=self.num_heads, dropout=self.dropout,
            max_it=self.max_it, frame_per_latent=self.frame_per_latent,
            lad=self.lad, dvae=self.dvae,
            percentage_noised=self.percentage_noised,
            mlp_dist=self.mlp_dist, test_efficiency=self.test_efficiency,
            dtype=self.dtype)

    @property
    def denoiser(self) -> LADenoiser:
        return LADenoiser(
            nfeats=self.nfeats, latent_dim=self.latent_dim,
            ff_size=self.ff_size,
            num_layers=self.denoiser_num_layers or self.num_layers,
            num_heads=self.num_heads, dropout=self.dropout,
            text_encoded_dim=self.text_encoded_dim, md_trans=self.md_trans,
            condition=self.condition, nclasses=self.nclasses,
            diffusion_only=(self.vae_type == "no"),
            guidance_uncondp=self.guidance_uncondp, dtype=self.dtype)

    @property
    def schedule(self) -> DiffusionSchedule:
        return make_schedule(
            num_train_timesteps=self.num_train_timesteps,
            prediction_type="epsilon" if self.predict_epsilon else "sample")

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        B, T = 2, self.max_frames
        feats = jnp.zeros((B, T, self.nfeats))
        lengths = jnp.full((B,), T, jnp.int32)
        v_rng, d_rng, s_rng = jax.random.split(rng, 3)
        if self.vae_type == "no":
            # diffusion-only: no VAE; denoiser diffuses feature frames
            frame_valid = lengths_to_mask(lengths, T)
            den_params = self.denoiser.init(
                d_rng, feats, jnp.zeros((B,), jnp.int32),
                jnp.zeros((B, 1, self.text_encoded_dim)), None,
                frame_valid=frame_valid)["params"]
            return {"vae": {}, "denoiser": den_params}
        vae_params = self.vae.init(v_rng, feats, lengths, s_rng)["params"]
        n_lat = self.max_it if self.max_it else int(self.latent_dim[0])
        sample = jnp.zeros((B, n_lat, self.latent_dim[-1]))
        t = jnp.zeros((B,), jnp.int32)
        if self.condition == "action":
            cond = jnp.zeros((B,), jnp.int32)
        else:
            cond = jnp.zeros((B, 1, self.text_encoded_dim))
        valid = jnp.ones((B, n_lat), bool) if self.max_it else None
        den_params = self.denoiser.init(d_rng, sample, t, cond, valid)["params"]
        return {"vae": vae_params, "denoiser": den_params}

    # ------------------------------------------------------------------
    def feats2joints(self, feats: jax.Array) -> jax.Array:
        """Denormalize + RIC recovery (reference data/HumanML3D.py:44-48)."""
        if self.mean is not None:
            feats = feats * self.std + self.mean
        return recover_from_ric(feats, self.njoints)

    def renorm4t2m(self, feats: jax.Array, mean_eval, std_eval) -> jax.Array:
        """Re-normalize to T2M evaluator stats (HumanML3D.py:57-65)."""
        feats = feats * self.std + self.mean
        return (feats - mean_eval) / std_eval

    def feats2joints_action(self, feats: jax.Array,
                            mask: jax.Array) -> jax.Array:
        """Action-path vertices (reference feats2joints lambda,
        ladiff.py:164-173: jointstype='vertices', vertstrans=False) —
        consumed by the a2m VAE ``recons_joints`` loss (:836-837) and
        MRMetrics on the action validation path."""
        return self.rot2xyz(feats, mask, jointstype="vertices",
                            vertstrans=False)

    def feats2joints_action_eval(self, feats: jax.Array,
                                 mask: jax.Array) -> jax.Array:
        """Action-path 24x3 SMPL joints (reference feats2joints_eval lambda,
        ladiff.py:152-162: jointstype='smpl', vertstrans=True) — what
        HUMANACTMetrics' 72-input GRU classifier consumes (:1470-1474,
        gru.py:32-36)."""
        return self.rot2xyz(feats, mask, jointstype="smpl", vertstrans=True)

    # -- stage 1: VAE ---------------------------------------------------
    def vae_forward(self, vae_params, batch: Dict[str, jax.Array],
                    rng: jax.Array, train: bool = True):
        """Reconstruction pass + losses (reference train_vae_forward :815).

        The reference also re-encodes the reconstruction (``recons_z``,
        ladiff.py:828, "prepare for metric") but its stage-``vae`` loss
        never consumes it (losses/mld.py:103-108 uses only recons/KL and
        ``latent_*`` losses are never in ``cfg.LOSS.TYPE`` for this stage),
        so that full extra encoder pass is deliberately omitted here."""
        feats_ref = batch["motion"]
        lengths = batch["length"]
        enc_rng, dec_rng, drop_rng = jax.random.split(rng, 3)
        z, mu, logvar, lat_valid = self.vae.apply(
            {"params": vae_params}, feats_ref, lengths,
            rng=enc_rng, deterministic=not train,
            rngs={"dropout": drop_rng} if train else {},
            method=self.vae.encode)
        feats_rst = self.vae.apply(
            {"params": vae_params}, z, lengths, nframes=feats_ref.shape[1],
            deterministic=not train,
            rngs={"dropout": jax.random.fold_in(drop_rng, 1)} if train else {},
            method=self.vae.decode)
        if self.condition == "action":
            # a2m features are rot6d(+trans): the joint term goes through the
            # SMPL forward pass to VERTICES, exactly like the reference
            # (ladiff.py:164-173 feats2joints -> rot2xyz jointstype='vertices',
            # applied unconditionally at :834-837 with LAMBDA_JOINT from
            # base.yaml:65); smooth_l1 means over the full tensor with masked
            # frames zeroed on both sides, matching the reference reduction
            mask = batch.get("mask")
            if mask is None:
                mask = lengths_to_mask(lengths, feats_ref.shape[1])
            joints_rst = self.feats2joints_action(feats_rst, mask)
            joints_ref = self.feats2joints_action(feats_ref, mask)
        else:
            joints_rst = self.feats2joints(feats_rst)
            joints_ref = self.feats2joints(feats_ref)
        total, logs = vae_loss(feats_rst, feats_ref, joints_rst, joints_ref,
                               mu, logvar, self.weights)
        aux = {"feats_rst": feats_rst, "z": z, "latent_valid": lat_valid,
               "joints_rst": joints_rst, "joints_ref": joints_ref}
        return total, (logs, aux)

    # -- stage 2: diffusion --------------------------------------------
    def diffusion_forward(self, den_params, vae_params,
                          batch: Dict[str, jax.Array], rng: jax.Array,
                          uncond_emb: jax.Array, train: bool = True):
        """Noise-prediction training pass
        (reference train_diffusion_forward :874 + _diffusion_process :745)."""
        feats_ref = batch["motion"]
        lengths = batch["length"]
        if self.condition == "action":
            # class ids; EmbedAction applies the CFG unconditional drop
            # internally via the cond_drop rng (ladiff_denoiser.py:329-343)
            cond = batch["action"][:, 0]
        else:
            cond = batch["text_emb"]  # [B, 1, 768] pooled CLIP features
        B = feats_ref.shape[0]
        enc_rng, t_rng, n_rng, cfg_rng, drop_rng = jax.random.split(rng, 5)

        if self.vae_type == "no":
            # diffusion-only / feature-space diffusion (reference
            # modules_novae family: ladiff.py:911-912 takes z = features)
            z = feats_ref
            lat_valid = None
            frame_valid = lengths_to_mask(lengths, feats_ref.shape[1])
        else:
            # frozen VAE encode (no grad through vae_params by construction).
            # Stop the gradient at the PARAMS, not just at z: in the joint
            # vae_diffusion stage vae_params are differentiated elsewhere,
            # and tangent-carrying inputs would force AD through this
            # deterministic encode's fused kernels (which define no VJP)
            # even though the tangents are discarded at z anyway.
            z, _, _, lat_valid = self.vae.apply(
                {"params": jax.lax.stop_gradient(vae_params)}, feats_ref,
                lengths, rng=enc_rng, deterministic=True,
                method=self.vae.encode)
            z = jax.lax.stop_gradient(z)
            frame_valid = None

        # classifier-free caption dropout (reference ladiff.py:919-923)
        if (train and self.guidance_uncondp > 0.0
                and self.condition != "action"):
            drop = jax.random.bernoulli(cfg_rng, self.guidance_uncondp, (B, 1, 1))
            cond = jnp.where(drop, uncond_emb.astype(cond.dtype), cond)

        schedule = self.schedule
        noise = jax.random.normal(n_rng, z.shape, z.dtype)
        timesteps = jax.random.randint(
            t_rng, (B,), 0, schedule.num_train_timesteps)
        noisy = schedule.add_noise(z, noise, timesteps)
        if self.lad and lat_valid is not None:
            # re-zero inactive rows after noising (reference ladiff.py:779-782)
            noisy = jnp.where(lat_valid[:, :, None], noisy, 0.0)

        rngs = {"dropout": drop_rng} if train else {}
        if train and self.condition == "action":
            rngs["cond_drop"] = cfg_rng
        noise_pred = self.denoiser.apply(
            {"params": den_params}, noisy, timesteps, cond, lat_valid,
            frame_valid=frame_valid,
            deterministic=not train,
            rngs=rngs)

        if self.predict_epsilon:
            total, logs = diffusion_loss(noise_pred, noise)
        else:
            total, logs = diffusion_loss(noise_pred, noise,
                                         predict_epsilon=False,
                                         x0_pred=noise_pred, x0=z)
        return total, (logs, {"latent_valid": lat_valid})

    # -- stage 3: joint finetune ---------------------------------------
    def vae_diffusion_forward(self, params, batch: Dict[str, jax.Array],
                              rng: jax.Array, uncond_emb: jax.Array,
                              train: bool = True):
        """Joint stage (reference TRAIN.STAGE=vae_diffusion,
        allsplit_step :1395-1407): VAE reconstruction losses + diffusion
        noise loss + generation losses on a full text->sample->decode pass
        (``gen_feature``/``gen_joints``, losses/mld.py:124-130).

        The generation branch samples with few DDIM steps under
        stop-gradient through the sampler chain except the final decode —
        gradients flow into the decoder (the reference finetunes the
        decoder on generated latents via ``FINETUNE_DECODER``)."""
        vae_rng, diff_rng, gen_rng = jax.random.split(rng, 3)
        vae_total, (vae_logs, vae_aux) = self.vae_forward(
            params["vae"], batch, vae_rng, train=train)
        diff_total, (diff_logs, _) = self.diffusion_forward(
            params["denoiser"], params["vae"], batch, diff_rng, uncond_emb,
            train=train)

        lengths = batch["length"]
        text_emb = batch["text_emb"]
        z_gen = self.diffusion_reverse(
            jax.lax.stop_gradient(params["denoiser"]), text_emb,
            jnp.broadcast_to(uncond_emb, text_emb.shape), lengths, gen_rng,
            num_inference_timesteps=min(self.num_inference_timesteps, 10))
        z_gen = jax.lax.stop_gradient(z_gen)
        # eval-mode (no-dropout) decode WITH gradients into the decoder —
        # must stay on XLA ops: the fused inference kernels have no VJP
        from ladiff_tpu.ops.pallas_common import no_pallas
        with no_pallas():
            gen_feats = self.vae.apply(
                {"params": params["vae"]}, z_gen, lengths,
                nframes=batch["motion"].shape[1], deterministic=True,
                method=self.vae.decode)
        gen_joints = self.feats2joints(gen_feats)
        from ladiff_tpu.losses.mld import smooth_l1
        gen_feature = smooth_l1(gen_feats, batch["motion"])
        gen_joints_l = smooth_l1(gen_joints, vae_aux["joints_ref"])
        w = self.weights
        total = (vae_total + diff_total + w.lambda_gen * gen_feature
                 + w.lambda_joint * gen_joints_l)
        logs = {**{f"vae_{k}": v for k, v in vae_logs.items()},
                **{f"diff_{k}": v for k, v in diff_logs.items()},
                "gen_feature": gen_feature, "gen_joints": gen_joints_l,
                "total": total}
        return total, (logs, vae_aux)

    # -- sampling -------------------------------------------------------
    def diffusion_reverse(self, den_params, text_emb_cond: jax.Array,
                          text_emb_uncond: jax.Array, lengths: jax.Array,
                          rng: jax.Array,
                          num_inference_timesteps: Optional[int] = None,
                          return_trajectory: bool = False):
        """CFG DDIM sampling of latents [B, max_it, D]
        (reference _diffusion_reverse :333-571, non-AR path).
        ``return_trajectory`` also yields the per-step latents
        (reference _diffusion_reverse_tsne :573-743, used for the latent
        t-SNE analysis script)."""
        B = text_emb_cond.shape[0]
        if self.vae_type == "no":
            # feature-space diffusion: "latents" are padded feature frames
            # (reference ladiff.py:509-515); frame mask drives the denoiser
            # and doubles as the sampler row mask (the reference leaves
            # noise in padded frames and zeroes at the consumer instead —
            # same observable output)
            D = self.nfeats
            n_lat = self.max_frames
            frame_valid = lengths_to_mask(lengths, self.max_frames)
            lat_valid = frame_valid
        else:
            D = self.latent_dim[-1]
            n_lat = self.max_it if self.max_it else int(self.latent_dim[0])
            lat_valid = (latent_valid_mask(lengths, self.frame_per_latent,
                                           self.max_it)
                         if (self.lad and self.max_it) else None)
            frame_valid = None
        steps = num_inference_timesteps or self.num_inference_timesteps

        denoiser = self.denoiser
        # hoist step-invariant work out of the scan: text projection (once)
        # and the full timestep-embedding table (all DDIM steps are static)
        text_cond_l = denoiser.apply({"params": den_params}, text_emb_cond,
                                     method=denoiser.project_text)
        text_uncond_l = denoiser.apply({"params": den_params}, text_emb_uncond,
                                       method=denoiser.project_text)
        from ladiff_tpu.diffusion.schedulers import ddim_timesteps
        ts_np, _ = ddim_timesteps(
            self.schedule.num_train_timesteps, steps,
            steps_offset=1 if self.scheduler_kind == "ddim" else 0)
        time_table = denoiser.apply(
            {"params": den_params}, jnp.asarray(ts_np),
            method=denoiser.compute_time_embedding)  # [steps, D]

        # hoist the fused MD path's per-layer prep out of the scan as well:
        # per-layer ca text values (step-invariant) + AdaLN scale/shift rows
        # for every step (all samples share a step's time embedding)
        md_values = md_tables = md_stack = None
        if getattr(denoiser, "md_trans", False) and text_cond_l.shape[1] == 1:
            text_for_batch = (jnp.concatenate([text_uncond_l, text_cond_l], 0)
                              if self.guidance_scale > 1.0 else text_cond_l)
            prep_all = denoiser.apply(
                {"params": den_params}, text_for_batch, time_table,
                method=denoiser.precompute_md_prep)
            from ladiff_tpu.ops.stylization import md_stack_enabled
            if md_stack_enabled(denoiser.d_model, denoiser.ff_size,
                                denoiser.num_heads):
                # whole-stack kernel path: stacked params + values hoisted
                # here (step-invariant); AdaLN tables [S, L, 2D] scanned
                values_s, ca_t, ffn_t = denoiser.apply(
                    {"params": den_params}, prep_all,
                    method=denoiser.stack_md_prep)
                md_stack = {
                    "params": denoiser.apply(
                        {"params": den_params},
                        method=denoiser.precompute_md_stack),
                    "values": values_s,
                }
                md_tables = {"ca_ss": ca_t, "ffn_ss": ffn_t}
            else:
                md_values = {k: v["value"] for k, v in prep_all.items()}
                md_tables = {k: {"ca_ss": v["ca_ss"], "ffn_ss": v["ffn_ss"]}
                             for k, v in prep_all.items()}

        def denoise(latents, t, text, valid, aux):
            time_row, md_rows = aux
            time_emb = jnp.broadcast_to(time_row[None, :],
                                        (latents.shape[0], time_row.shape[0]))
            fv = frame_valid
            if fv is not None and latents.shape[0] != fv.shape[0]:
                fv = jnp.concatenate([fv, fv], axis=0)  # CFG doubling
            md_prep = None
            if md_rows is not None and md_stack is not None:
                md_prep = {"stack": {**md_stack, **md_rows}}
            elif md_rows is not None:
                md_prep = {k: {"value": md_values[k], **md_rows[k]}
                           for k in md_rows}
            return denoiser.apply(
                {"params": den_params}, latents, None, None, valid,
                frame_valid=fv,
                deterministic=True, time_emb=time_emb, text_emb_latent=text,
                md_prep=md_prep)

        guided = make_cfg_denoise_fn(denoise, text_uncond_l, text_cond_l,
                                     self.guidance_scale)
        return ddim_sample(
            guided, self.schedule, rng, (B, n_lat, D), steps,
            latent_valid=lat_valid, eta=self.eta,
            step_aux=(time_table, md_tables),
            return_trajectory=return_trajectory, kind=self.scheduler_kind)

    def diffusion_reverse_ar(self, den_params, text_emb_cond: jax.Array,
                             text_emb_uncond: jax.Array, lengths: jax.Array,
                             rng: jax.Array,
                             num_inference_timesteps: Optional[int] = None):
        """Autoregressive variant: denoise one latent token at a time,
        conditioned on previously generated tokens
        (reference _diffusion_reverse ARDIFF path, ladiff.py:419-467;
        ``motion_conditioning`` last|full, config :135).

        Static-shape recast: an outer scan over all MAX_IT token positions
        with validity-masked conditioning replaces the reference's Python
        loop over ``ceil(max(lengths)/FRAME_PER_LATENT)`` iterations; rows
        beyond a sample's active count are zeroed at the end exactly as the
        reference does (ladiff.py:562-569)."""
        from ladiff_tpu.diffusion.schedulers import ddim_timesteps

        B = text_emb_cond.shape[0]
        D = self.latent_dim[-1]
        M = self.max_it
        schedule = self.schedule
        steps = num_inference_timesteps or self.num_inference_timesteps
        denoiser = self.denoiser
        lat_valid = latent_valid_mask(lengths, self.frame_per_latent, M)

        text_cond_l = denoiser.apply({"params": den_params}, text_emb_cond,
                                     method=denoiser.project_text)
        text_uncond_l = denoiser.apply({"params": den_params}, text_emb_uncond,
                                       method=denoiser.project_text)
        ts_np, prev_np = ddim_timesteps(schedule.num_train_timesteps, steps)
        ts = jnp.asarray(ts_np)
        prev_ts = jnp.asarray(prev_np)
        time_table = denoiser.apply(
            {"params": den_params}, ts, method=denoiser.compute_time_embedding)
        do_cfg = self.guidance_scale > 1.0
        text2 = (jnp.concatenate([text_uncond_l, text_cond_l], axis=0)
                 if do_cfg else text_cond_l)

        def denoise_token(latents, enclat, enclat_valid, time_row):
            b = latents.shape[0]
            if do_cfg:
                model_in = jnp.concatenate([latents, latents], axis=0)
                enc2 = jnp.concatenate([enclat, enclat], axis=0)
                encv2 = jnp.concatenate([enclat_valid, enclat_valid], axis=0)
                te = jnp.broadcast_to(time_row[None], (2 * b, time_row.shape[0]))
                eps = denoiser.apply(
                    {"params": den_params}, model_in, None, None, None,
                    enclat=enc2, enclat_valid=encv2, deterministic=True,
                    time_emb=te, text_emb_latent=text2)
                eps_u, eps_t = eps[:b], eps[b:]
                return eps_u + self.guidance_scale * (eps_t - eps_u)
            te = jnp.broadcast_to(time_row[None], (b, time_row.shape[0]))
            return denoiser.apply(
                {"params": den_params}, latents, None, None, None,
                enclat=enclat, enclat_valid=enclat_valid, deterministic=True,
                time_emb=te, text_emb_latent=text2)

        def token_step(carry, k):
            final, rng = carry
            rng, init_rng = jax.random.split(rng)
            latents = jax.random.normal(init_rng, (B, 1, D), jnp.float32)
            latents = latents * schedule.init_noise_sigma
            if self.motion_conditioning == "last":
                prev_idx = jnp.maximum(k - 1, 0)
                enclat = jax.lax.dynamic_slice(final, (0, prev_idx, 0),
                                               (B, 1, D))
                enclat_valid = jnp.broadcast_to((k > 0)[None, None], (B, 1))
            else:  # "full" (and "middle" future-conditioning reduces to it
                   # at inference: reference uses only past tokens)
                enclat = final
                enclat_valid = jnp.broadcast_to(
                    (jnp.arange(M)[None, :] < k), (B, M))

            def ddim_step(lat, scanned):
                t, t_prev, time_row = scanned
                eps = denoise_token(lat, enclat, enclat_valid, time_row)
                return schedule.ddim_step(eps, t, t_prev, lat,
                                          eta=self.eta), None

            latents, _ = jax.lax.scan(ddim_step, latents,
                                      (ts, prev_ts, time_table))
            final = jax.lax.dynamic_update_slice(final, latents, (0, k, 0))
            return (final, rng), None

        final0 = jnp.zeros((B, M, D), jnp.float32)
        (final, _), _ = jax.lax.scan(token_step, (final0, rng), jnp.arange(M))
        return jnp.where(lat_valid[:, :, None], final, 0.0)

    def diffusion_forward_ar(self, den_params, vae_params,
                             batch: Dict[str, jax.Array], rng: jax.Array,
                             uncond_emb: jax.Array, train: bool = True):
        """AR training pass (reference train_diffusion_forward ARDIFF branch,
        ladiff.py:944-1029): diffuse one randomly chosen latent token,
        conditioned on its predecessor; with p=1/3 train the first token
        unconditioned."""
        feats_ref = batch["motion"]
        lengths = batch["length"]
        text_emb = batch["text_emb"]
        B = feats_ref.shape[0]
        (enc_rng, t_rng, n_rng, cfg_rng, drop_rng, idx_rng,
         coin_rng) = jax.random.split(rng, 7)

        # params-level stop_gradient: same reasoning as diffusion_forward
        z, _, _, lat_valid = self.vae.apply(
            {"params": jax.lax.stop_gradient(vae_params)}, feats_ref,
            lengths, rng=enc_rng, deterministic=True, method=self.vae.encode)
        z = jax.lax.stop_gradient(z)
        n_active = lat_valid.sum(axis=1)

        if train and self.guidance_uncondp > 0.0:
            drop = jax.random.bernoulli(cfg_rng, self.guidance_uncondp,
                                        (B, 1, 1))
            text_emb = jnp.where(drop, uncond_emb.astype(text_emb.dtype),
                                 text_emb)

        # latent_idx ~ U{1, ..., n_active-1} (samples with a single active
        # token train the first token unconditioned)
        u = jax.random.uniform(idx_rng, (B,))
        hi = jnp.maximum(n_active - 1, 1)
        latent_idx = 1 + jnp.floor(u * hi).astype(jnp.int32)
        latent_idx = jnp.minimum(latent_idx, jnp.maximum(n_active - 1, 0))
        coin = jax.random.uniform(coin_rng, ()) < (1.0 / 3.0)
        latent_idx = jnp.where(coin | (n_active <= 1), 0, latent_idx)

        take = lambda arr, idx: jnp.take_along_axis(
            arr, idx[:, None, None], axis=1)
        z_tok = take(z, latent_idx)                      # [B, 1, D]
        cond_tok = take(z, jnp.maximum(latent_idx - 1, 0))
        cond_valid = (latent_idx > 0)[:, None]           # [B, 1]

        schedule = self.schedule
        noise = jax.random.normal(n_rng, z_tok.shape, z_tok.dtype)
        timesteps = jax.random.randint(t_rng, (B,), 0,
                                       schedule.num_train_timesteps)
        noisy = schedule.add_noise(z_tok, noise, timesteps)

        noise_pred = self.denoiser.apply(
            {"params": den_params}, noisy, timesteps, text_emb, None,
            enclat=cond_tok, enclat_valid=cond_valid,
            deterministic=not train,
            rngs={"dropout": drop_rng} if train else {})

        if self.predict_epsilon:
            total, logs = diffusion_loss(noise_pred, noise)
        else:
            total, logs = diffusion_loss(noise_pred, noise,
                                         predict_epsilon=False,
                                         x0_pred=noise_pred, x0=z_tok)
        return total, (logs, {"latent_valid": lat_valid})

    def generate(self, params, text_emb_cond, text_emb_uncond, lengths, rng,
                 nframes: Optional[int] = None,
                 num_inference_timesteps: Optional[int] = None):
        """text embeddings -> motion features (reference forward :250-308)."""
        reverse = (self.diffusion_reverse_ar if self.ardiff
                   else self.diffusion_reverse)
        z = reverse(
            params["denoiser"], text_emb_cond, text_emb_uncond, lengths, rng,
            num_inference_timesteps)
        if self.vae_type == "no":
            # feature-space diffusion: z already IS the features
            return z, z
        feats = self.vae.apply(
            {"params": params["vae"]}, z, lengths,
            nframes=nframes or self.max_frames, deterministic=True,
            method=self.vae.decode)
        return feats, z
