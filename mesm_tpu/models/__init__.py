from .layers import LinearBlock, MLP, PReLU, torch_linear_kernel_init, torch_linear_bias_init
from .position import SinePositionEmbedding, TrainablePositionEmbedding
from .attention import ProjAttention, CoreAttention, attention_core
from .t2v import T2VEncoder, T2VLayer
from .detr import Transformer, TransformerEncoder, TransformerDecoder, gen_sine_embed
from .text_encoder import CLIPTextEncoder, GloVeTextEncoder
from .mesm import MESM, SegSenRecon
