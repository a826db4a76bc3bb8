"""torch.hub entry points (reference: hubconf.py:6-23).

Lets released / exported SiMHand encoders load through ``torch.hub``
exactly like the reference repo:

    model = torch.hub.load("<this repo>", "resnet50_simhand",
                           pretrained=True)            # release download
    model = torch.hub.load("<this repo>", "resnet50_simhand",
                           path="resnet50_simhand.pth")  # local export

plus a flax-native variant for JAX users (``resnet50_simhand_flax``).
"""

dependencies = ["torch"]

_RELEASE_URL = (
    "https://github.com/ut-vision/SiMHand/releases/download/"
    "{version}/resnet50_simhand.pth"
)


def resnet50_simhand(pretrained=False, version="v1.0", path=None, **kwargs):
    """torchvision ResNet-50 with SiMHand pre-trained weights.

    ``path``: load a local ``.pth`` (e.g. this framework's
    ``--export_torch`` output) instead of downloading the release.
    Matches the reference entry's behavior (same release URL scheme).
    """
    import torch

    try:
        from torchvision.models import resnet50
    except ImportError as e:  # pragma: no cover - env without torchvision
        raise ImportError(
            "resnet50_simhand builds a torchvision model; install "
            "torchvision, or use resnet50_simhand_flax for the JAX-native "
            "encoder"
        ) from e

    model = resnet50(weights=None)
    if path is not None:
        state_dict = torch.load(path, map_location="cpu", weights_only=True)
        model.load_state_dict(state_dict, strict=False)
    elif pretrained:
        state_dict = torch.hub.load_state_dict_from_url(
            _RELEASE_URL.format(version=version),
            map_location=torch.device("cpu"),
            progress=True,
        )
        model.load_state_dict(state_dict)
    return model


def resnet50_simhand_flax(path, **kwargs):
    """(params, batch_stats) for ``simhand_tpu.models.resnet50`` from a
    released / exported ``resnet50_simhand.pth``."""
    from simhand_tpu.hub import load_resnet50_simhand

    return load_resnet50_simhand(path)
