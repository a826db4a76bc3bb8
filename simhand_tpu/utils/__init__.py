"""Shared small utilities (reference: src/utils.py read_json/save_json/
read_yaml + console logger factory)."""
import json
import logging


def read_json(path: str):
    with open(path) as f:
        return json.load(f)


def save_json(obj, path: str) -> None:
    with open(path, "w") as f:
        json.dump(obj, f)


def read_yaml(path: str):
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def get_console_logger(name: str = "simhand_tpu") -> logging.Logger:
    lg = logging.getLogger(name)
    if not lg.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
        lg.addHandler(h)
        lg.setLevel(logging.INFO)
    return lg
