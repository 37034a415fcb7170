from .losses import resolve_loss, resolve_prediction, cross_entropy, margin_loss, make_decision  # noqa: F401
from .eot import EOT  # noqa: F401
from .pgd import AudioAttack, project_to_norm_ball, lp_norm  # noqa: F401
from .masker import PsychoacousticMasker  # noqa: F401
from .nes import nes_grad  # noqa: F401
from .fakebob import FAKEBOB  # noqa: F401
from .siren import SirenAttack  # noqa: F401
from .kenansville import Kenansville  # noqa: F401
from .bpda import bpda  # noqa: F401
