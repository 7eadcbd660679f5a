class Normalize:  # import-time placeholder only
    def __init__(self, *a, **k):
        pass


class CenterCrop:
    def __init__(self, *a, **k):
        pass
