"""toyfhe_tpu — a TPU-native somewhat-homomorphic encryption framework.

Built from scratch against the capability surface of ToyFHE.jl (BFV, BGV,
CKKS over power-of-two and general cyclotomic rings, RNS towers, SIMD slot
packing, key switching, modulus switching/rescaling, special-prime key
switching, noise tracking, encrypted-MNIST inference), redesigned for
JAX/XLA/Pallas: dense uint32 residue tensors, 32-bit Montgomery limb
arithmetic, batched negacyclic NTT kernels, host-side encoders, and
mesh-sharded RNS parallelism.

Layer map (SURVEY.md §1): ops/ = L0-L2 kernels, core/ = L3-L5 engine +
schemes + encodings, parallel/ = mesh sharding, models/ = L6 applications.
"""

from .core.ring import RingContext, RingElt, make_ring, make_rns_ring
from .core import ring as ringops
from .core.plain import (PlainRing, PlainPoly, scalar_encode, scalar_decode,
                         coeff_encode, slot_encode, slot_decode)
from .core.rlwe import (SchemeParams, PassthroughParams, PrivKey, PubKey,
                        KeyPair, KeySwitchKey, EvalMultKey, GaloisKey,
                        GaloisKeys, CipherText, UsageError, RingElt,
                        keygen, encrypt, decrypt, ct_add, ct_sub, ct_mul,
                        ct_add_ring, keyswitch, rotate, make_eval_key,
                        keygen_eval_mult, keygen_galois, keygen_galois_set,
                        apply_galois_ct, ct_modswitch_drop, ct_rescale, ct_stack, ct_index,
                        decrypt_raw, galois_element_for_steps)
from .core.bfv import BFVParams, bfv_params, invariant_noise_budget
from .core.bgv import BGVParams
from .core.ckks import CKKSParams
from .core.ckks_encoding import (CKKSPlaintext, CKKSTag, make_plaintext,
                                 ckks_encode, ckks_decode, mul_plain_scalar,
                                 mul_plain_vector, add_plain)
from .core.modraise import ModulusRaised
from .core.hybrid import HybridRaised
from .core.rlwe import rotate_many, rotate_sum
from .core.insecure import InsecureDebug
from .core.noise import bgv_noise_budget, ckks_precision, ckks_scale_bits
from .core.planner import plan_ckks_tower, plan_ckks_ring
from .core.cryptparams import estimate_security, security_level
from .core import cryptparams
from .core import bootstrap
from .utils import metrics, serialization

__version__ = "0.1.0"
