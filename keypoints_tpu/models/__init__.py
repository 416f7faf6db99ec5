from keypoints_tpu.models.autoencoder import KeypointAutoencoder
from keypoints_tpu.models.nets import Decoder, Encoder, KeyNet
from keypoints_tpu.models.transporter import Transporter

__all__ = ["KeypointAutoencoder", "Transporter", "Encoder", "KeyNet",
           "Decoder"]
