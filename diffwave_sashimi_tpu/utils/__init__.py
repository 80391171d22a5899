from .exp import local_directory, find_max_epoch, model_identifier
