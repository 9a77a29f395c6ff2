from .meters import AverageMeter
from .io import load_json, save_json, load_jsonl, save_jsonl, dict_to_markdown, mkdirp
from .checkpoint import save_checkpoint, load_checkpoint, count_parameters
