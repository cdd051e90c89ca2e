from .registry import Registry, build_from_cfg
from .config import ConfigDict, get_config, cfg_from_yaml_file, merge_new_config
from .logger import get_logger, print_log
