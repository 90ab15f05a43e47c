from .resnet import ResNet, resnet_feature_channels

__all__ = ["ResNet", "resnet_feature_channels"]
