"""The seven margin-softmax / metric-learning objectives.

Numerically mirrors reference ``ppvector/loss/*.py`` (AAM / AM / ARM / CE /
SphereFace2 / SubCenter / TripletAngularMargin), re-designed for XLA:

- losses are pure callables ``loss(outputs, labels, margin=..., params=...)``;
- the scheduled ``margin`` is a traced scalar input (device array), so the
  per-step margin scheduler costs nothing — the reference instead mutates
  python floats on the loss object every step;
- hard example mining in the triplet loss uses masked min/max instead of
  boolean ``masked_select`` (dynamic shapes would break XLA);
- SphereFace2's learnable bias lives in an explicit ``params`` dict managed
  by the trainer (exposed via ``init_params()``).

All losses also keep the reference's ``update(margin)`` protocol so the
``MarginScheduler`` drives them identically.
"""

import jax
import jax.numpy as jnp
import optax

__all__ = ["AAMLoss", "AMLoss", "ARMLoss", "CELoss", "SphereFace2",
           "SubCenterLoss", "TripletAngularMarginLoss"]


def _ce(logits, labels, label_smoothing=0.0):
    """Mean cross-entropy with label smoothing (paddle CrossEntropyLoss
    semantics used throughout the reference losses)."""
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    if label_smoothing > 0.0:
        one_hot = optax.smooth_labels(one_hot, label_smoothing)
    return optax.softmax_cross_entropy(logits, one_hot).mean()


class _Loss:
    """Base: margin bookkeeping + empty param surface."""

    def __init__(self, margin=0.2):
        self.margin = margin

    def update(self, margin=0.2):
        """reference per-step margin update protocol
        (e.g. ``loss/aamloss.py`` update)."""
        self.margin = margin

    def init_params(self):
        return {}

    def _m(self, margin):
        return self.margin if margin is None else margin


class AAMLoss(_Loss):
    """Additive angular margin (ArcFace) on cosine logits
    (reference ``loss/aamloss.py``)."""

    def __init__(self, margin=0.2, scale=32, easy_margin=False,
                 label_smoothing=0.0):
        super().__init__(margin)
        self.scale = scale
        self.easy_margin = easy_margin
        self.label_smoothing = label_smoothing

    def __call__(self, outputs, labels, margin=None, params=None):
        logits = outputs["logits"]
        m = jnp.asarray(self._m(margin), dtype=logits.dtype)
        cos_m, sin_m = jnp.cos(m), jnp.sin(m)
        th = jnp.cos(jnp.pi - m)
        mmm = 1.0 + jnp.cos(jnp.pi - m)

        sine = jnp.sqrt(jnp.maximum(1.0 - logits ** 2, 0.0))
        phi = logits * cos_m - sine * sin_m
        if self.easy_margin:
            phi = jnp.where(logits > 0, phi, logits)
        else:
            phi = jnp.where(logits > th, phi, logits - mmm)

        one_hot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
        output = (one_hot * phi + (1.0 - one_hot) * logits) * self.scale
        return _ce(output, labels, self.label_smoothing)


class AMLoss(_Loss):
    """Additive (cosine) margin, CosFace (reference ``loss/amloss.py``)."""

    def __init__(self, margin=0.2, scale=30, label_smoothing=0.0):
        super().__init__(margin)
        self.scale = scale
        self.label_smoothing = label_smoothing

    def __call__(self, outputs, labels, margin=None, params=None):
        logits = outputs["logits"]
        m = jnp.asarray(self._m(margin), dtype=logits.dtype)
        one_hot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
        output = self.scale * (logits - m * one_hot)
        return _ce(output, labels, self.label_smoothing)


class ARMLoss(_Loss):
    """Additive-reduction margin: subtract the target logit, clamp
    negatives to zero (reference ``loss/armloss.py``)."""

    def __init__(self, margin=0.2, scale=30, label_smoothing=0.0):
        super().__init__(margin)
        self.scale = scale
        self.label_smoothing = label_smoothing

    def __call__(self, outputs, labels, margin=None, params=None):
        logits = outputs["logits"]
        m = jnp.asarray(self._m(margin), dtype=logits.dtype)
        one_hot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
        costh_m_s = self.scale * (logits - m * one_hot)
        target = jnp.sum(costh_m_s * one_hot, axis=-1, keepdims=True)
        reduct = costh_m_s - target
        output = jnp.where(reduct < 0.0, 0.0, costh_m_s)
        return _ce(output, labels, self.label_smoothing)


class CELoss(_Loss):
    """Plain cross entropy (reference ``loss/celoss.py``)."""

    def __init__(self, label_smoothing=0.0):
        super().__init__(0.0)
        self.label_smoothing = label_smoothing

    def __call__(self, outputs, labels, margin=None, params=None):
        return _ce(outputs["logits"], labels, self.label_smoothing)

    def update(self, margin=0.2):
        pass


class SphereFace2(_Loss):
    """Binary-classification margin loss (reference ``loss/sphereface2.py``):
    g(z) = 2((z+1)/2)^t - 1 warped cosine, λ-weighted positive/negative
    log-sigmoid terms, learnable bias."""

    def __init__(self, margin=0.2, scale=32.0, lanbuda=0.7, t=3,
                 margin_type="C"):
        super().__init__(margin)
        self.scale = scale
        self.lanbuda = lanbuda
        self.t = t
        self.margin_type = margin_type

    def init_params(self):
        return {"sphereface2_bias": jnp.zeros((), jnp.float32)}

    def _fun_g(self, z):
        return 2.0 * ((z + 1.0) / 2.0) ** self.t - 1.0

    def __call__(self, outputs, labels, margin=None, params=None):
        logits = outputs["logits"]
        bias = params["sphereface2_bias"] if params else 0.0
        m = jnp.asarray(self._m(margin), dtype=logits.dtype)

        if self.margin_type == "A":
            cos_m, sin_m = jnp.cos(m), jnp.sin(m)
            th = jnp.cos(jnp.pi - m)
            mmm = 1.0 + jnp.cos(jnp.pi - m)
            sin = jnp.sqrt(jnp.maximum(1.0 - logits ** 2, 0.0))
            phi_p = jnp.where(logits > th, logits * cos_m - sin * sin_m,
                              logits - mmm)
            phi_n = logits * cos_m + sin * sin_m
            z_p = self.scale * self._fun_g(phi_p) + bias
            z_n = self.scale * self._fun_g(phi_n) + bias
        else:  # cosface type 'C'
            z_p = self.scale * (self._fun_g(logits) - m) + bias
            z_n = self.scale * (self._fun_g(logits) + m) + bias

        # log(1+exp(±z)) via softplus for numerical stability
        cos_p = self.lanbuda * jax.nn.softplus(-z_p)
        cos_n = (1.0 - self.lanbuda) * jax.nn.softplus(z_n)

        target = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
        loss = (target * cos_p + (1.0 - target) * cos_n).sum(axis=1).mean()
        return loss


class SubCenterLoss(_Loss):
    """Sub-center ArcFace: max over K sub-centers then AAM margin
    (reference ``loss/subcenterloss.py``; classifier K must match
    ``models/fc.py`` weight shape)."""

    def __init__(self, margin=0.2, scale=32, easy_margin=False, K=3,
                 label_smoothing=0.0):
        super().__init__(margin)
        self.scale = scale
        self.K = K
        self.easy_margin = easy_margin
        self.label_smoothing = label_smoothing

    def __call__(self, outputs, labels, margin=None, params=None):
        logits = outputs["logits"]
        cosine = jnp.max(
            logits.reshape(logits.shape[0], -1, self.K), axis=2)
        m = jnp.asarray(self._m(margin), dtype=logits.dtype)
        cos_m, sin_m = jnp.cos(m), jnp.sin(m)
        th = jnp.cos(jnp.pi - m)
        mmm = 1.0 + jnp.cos(jnp.pi - m)
        sine = jnp.sqrt(jnp.maximum(1.0 - cosine ** 2, 0.0))
        phi = cosine * cos_m - sine * sin_m
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            phi = jnp.where(cosine > th, phi, cosine - mmm)
        one_hot = jax.nn.one_hot(labels, cosine.shape[-1], dtype=cosine.dtype)
        output = (one_hot * phi + (1.0 - one_hot) * cosine) * self.scale
        return _ce(output, labels, self.label_smoothing)


class TripletAngularMarginLoss(_Loss):
    """CE + margin-ranking on cosine distance with in-batch hard
    positive/negative mining and absolute thresholds
    (reference ``loss/tripletangularmarginloss.py``; requires PK batches).

    The reference pads sub-threshold negative hinges with *ones* (not
    zeros) before averaging — reproduced faithfully."""

    def __init__(self, margin=0.5, normalize_feature=True, add_absolute=True,
                 absolute_loss_weight=1.0, ap_value=0.8, an_value=0.4,
                 label_smoothing=0.0):
        super().__init__(margin)
        self.normalize_feature = normalize_feature
        self.add_absolute = add_absolute
        self.absolute_loss_weight = absolute_loss_weight
        self.ap_value = ap_value
        self.an_value = an_value
        self.label_smoothing = label_smoothing

    def __call__(self, outputs, labels, margin=None, params=None):
        features, logits = outputs["features"], outputs["logits"]
        m = jnp.asarray(self._m(margin), dtype=features.dtype)
        loss_ce = _ce(logits, labels, self.label_smoothing)

        if self.normalize_feature:
            features = features / jnp.maximum(
                jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)

        dist = features @ features.T  # cosine similarity matrix
        same = labels[:, None] == labels[None, :]
        # hard positive: least-similar same-class; hard negative:
        # most-similar other-class (masked min/max, static shapes)
        dist_ap = jnp.min(jnp.where(same, dist, jnp.inf), axis=1)
        dist_an = jnp.max(jnp.where(same, -jnp.inf, dist), axis=1)

        # MarginRankingLoss(dist_ap, dist_an, y=1): max(0, m - (ap - an))
        loss = jnp.maximum(0.0, m + dist_an - dist_ap).mean()

        if self.add_absolute:
            abs_ap = jnp.maximum(self.ap_value - dist_ap, 0.0)
            abs_an = jnp.where(dist_an - self.an_value > 0,
                               dist_an - self.an_value, 1.0)
            loss = ((abs_an.mean() + abs_ap.mean())
                    * self.absolute_loss_weight + loss)
        return loss + loss_ce
