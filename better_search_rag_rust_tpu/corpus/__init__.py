from .walker import find_files_by_extensions, read_file, read_files  # noqa: F401
