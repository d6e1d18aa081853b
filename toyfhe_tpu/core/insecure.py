"""Zero-noise debug modifier — ``/root/reference/src/insecuredebug.jl``.

Replaces the noise distribution with the zero sampler so algorithmic bugs
can be isolated from noise-budget exhaustion. INSECURE by construction.
"""

from __future__ import annotations

from ..ops import sampling
from .ring import RingContext, RingElt
from .rlwe import PassthroughParams


class InsecureDebug(PassthroughParams):
    def scheme_name(self):
        return "Insecure " + self.params.scheme_name()

    def noise(self, key, ring: RingContext, batch=()):
        return RingElt(primal=sampling.zero(ring.mp, ring.n, batch))
