from .easydict import EasyDict
from .registry import register, construct_class_by_name, call_func_by_name, get_obj_by_name
from .logger import Logger, format_time
