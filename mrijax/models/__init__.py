"""Model families: 2D slice UNet (covers 2D + 2.5D), 3D UNet, 3D VAE."""

from mrijax.models.unet2d import UNet2D
from mrijax.models.unet3d import UNet3D
from mrijax.models.vae3d import VAE3D, Encoder3D, Decoder3D

__all__ = ["UNet2D", "UNet3D", "VAE3D", "Encoder3D", "Decoder3D"]
