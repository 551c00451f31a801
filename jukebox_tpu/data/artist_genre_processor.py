"""Artist/genre name normalisation and ID lookup (equivalent of
jukebox/data/artist_genre_processor.py). v2 normalises names to
lowercase_underscored bag-of-words genres; v3 lowercases whole strings.
Unknown names map to id 0 ("unknown")."""

import os
import re

_ACCEPTED = frozenset(
    [chr(i) for i in range(ord("a"), ord("z") + 1)]
    + [chr(i) for i in range(ord("A"), ord("Z") + 1)]
    + [chr(i) for i in range(ord("0"), ord("9") + 1)]
)
_UNDERSCORES = re.compile(r"_+")


def norm(s):
    s = "".join(c if c in _ACCEPTED else "_" for c in s.lower())
    return _UNDERSCORES.sub("_", s).strip("_")


def _reverse_lookup(name_to_id):
    id_to_names = {}
    for name, idx in name_to_id.items():
        id_to_names.setdefault(idx, []).append(name)
    return {idx: "_".join(sorted(names)) for idx, names in id_to_names.items()}


def _load_ids(path):
    ids = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            name, idx = line.strip().split(";")
            ids[name.lower()] = int(idx)
    return ids


class ArtistGenreProcessor:
    def __init__(self, v3=False):
        self.v3 = v3
        dirname = os.path.join(os.path.dirname(__file__), "ids")
        prefix = "v3" if v3 else "v2"
        self.artist_id_file = os.path.join(dirname, f"{prefix}_artist_ids.txt")
        self.genre_id_file = os.path.join(dirname, f"{prefix}_genre_ids.txt")
        self.artist_ids = _load_ids(self.artist_id_file)
        self.genre_ids = _load_ids(self.genre_id_file)
        self.artists = _reverse_lookup(self.artist_ids)
        self.genres = _reverse_lookup(self.genre_ids)

    def get_artist_id(self, artist):
        key = artist.lower() if self.v3 else norm(artist)
        if key not in self.artist_ids:
            print(f"Input artist {artist} maps to {key}, not present in "
                  f"{self.artist_id_file}; defaulting to (0, unknown)")
        return self.artist_ids.get(key, 0)

    def get_genre_ids(self, genre):
        words = [genre.lower()] if self.v3 else norm(genre).split("_")
        for word in words:
            if word not in self.genre_ids:
                print(f"Input genre {genre} maps to {words}; {word} not present "
                      f"in {self.genre_id_file}; defaulting to (0, unknown)")
        return [self.genre_ids.get(word, 0) for word in words]

    def get_artist(self, artist_id):
        return self.artists[artist_id]

    def get_genre(self, genre_ids):
        if self.v3:
            assert len(genre_ids) == 1
            return self.genres[genre_ids[0]]
        return "_".join(self.genres[g] for g in genre_ids if g >= 0)
