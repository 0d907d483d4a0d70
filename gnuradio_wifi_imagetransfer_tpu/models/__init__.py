"""Model zoo: the JSCE semantic codec (SOMA-DSCN), the SOMANet
multi-user models, and the research model families of the reference's
codec/models tree (ViT, Swin, MAE, CVAE, GNN, PropagNet) — all in Flax.
"""

from gnuradio_wifi_imagetransfer_tpu.models.jsce import JSCE  # noqa: F401
from gnuradio_wifi_imagetransfer_tpu.models.encoder import (  # noqa: F401
    Encoder, EncoderCSI, EncoderPE)
from gnuradio_wifi_imagetransfer_tpu.models.decoder import (  # noqa: F401
    Decoder, DecoderDSCN, DecoderOriginal, DecoderPE, DecoderSA)
from gnuradio_wifi_imagetransfer_tpu.models.somanet import SOMANet, SOMANetPE  # noqa: F401
from gnuradio_wifi_imagetransfer_tpu.models.vit import (  # noqa: F401
    Attention, CrossAttention, FeedForward, Transformer, ViT)
from gnuradio_wifi_imagetransfer_tpu.models.mae import (  # noqa: F401
    MAE, MaskedAutoencoderViT, mae_vit_base_patch16, mae_vit_huge_patch14,
    mae_vit_large_patch16)
from gnuradio_wifi_imagetransfer_tpu.models.swin import (  # noqa: F401
    DimReducePatchExpand, FinalPatchExpandX4, PatchEmbed, PatchExpand,
    PatchExpand2X, PatchMerging, SwinTransformerBlock, WindowAttention)
from gnuradio_wifi_imagetransfer_tpu.models.vae import ConditionalVAE, vae_loss  # noqa: F401
from gnuradio_wifi_imagetransfer_tpu.models.gnn import GCNConv, GNN  # noqa: F401
from gnuradio_wifi_imagetransfer_tpu.models.propagnet import PropagNet  # noqa: F401
from gnuradio_wifi_imagetransfer_tpu.models.csa import CSAAFB  # noqa: F401
from gnuradio_wifi_imagetransfer_tpu.models.vit_codec import ViTDecoder, ViTEncoder  # noqa: F401
