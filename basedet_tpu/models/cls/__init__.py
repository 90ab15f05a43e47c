from .csp_darknet import CSPDarknet
from .darknet import Darknet
from .resnet import ResNet, resnet_feature_channels

__all__ = ["CSPDarknet", "Darknet", "ResNet", "resnet_feature_channels"]
