"""Model zoo: unified TripleDNet + standalone pretext models + registry."""

from tripled_tpu.models.encoders import DepthEncoder, Extractor, PoseEncoder
from tripled_tpu.models.depth_decoder import DepthDecoder
from tripled_tpu.models.pose_decoder import PoseDecoder
from tripled_tpu.models.decoders import ColorDecoder, ImageDecoder
from tripled_tpu.models.net import TripleDNet
from tripled_tpu.models.aux_nets import Autoencoder, RotNet
from tripled_tpu.models.registry import available_models, build_model, canonicalize
