"""Feature Pyramid Network neck producing P3..P7 (Flax linen).

Rebuild of the reference's FPN (ref: src/retina_net/models/, canonical
RetinaNet neck; SURVEY.md §2 "FPN neck"): lateral 1x1 convs on C3-C5, top-down
nearest-neighbor upsample + sum, 3x3 smoothing convs, plus P6 = stride-2 conv
on C5 and P7 = stride-2 conv on relu(P6). All levels share `channels` width.

Upsampling is done with a static-shape reshape/broadcast (jnp.repeat on
spatial axes) rather than a resize op — the factor is always exactly 2 because
padded image shapes are multiples of the coarsest stride (ops/anchors.py), and
this form fuses trivially in XLA.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax.numpy as jnp


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample, NHWC, static shapes."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        c3, c4, c5 = feats["c3"], feats["c4"], feats["c5"]

        l5 = conv(self.channels, 1, 1, "lateral5")(c5)
        l4 = conv(self.channels, 1, 1, "lateral4")(c4) + _upsample2x(l5)
        l3 = conv(self.channels, 1, 1, "lateral3")(c3) + _upsample2x(l4)

        p3 = conv(self.channels, 3, 1, "smooth3")(l3)
        p4 = conv(self.channels, 3, 1, "smooth4")(l4)
        p5 = conv(self.channels, 3, 1, "smooth5")(l5)
        p6 = conv(self.channels, 3, 2, "p6")(c5)
        p7 = conv(self.channels, 3, 2, "p7")(nn.relu(p6))
        return [p3, p4, p5, p6, p7]
