from lvd_tpu.utils import words


def test_number_to_words():
    assert words.number_to_words(1) == "one"
    assert words.number_to_words(4) == "four"
    assert words.number_to_words(13) == "thirteen"
    assert words.number_to_words(20) == "twenty"
    assert words.number_to_words(21) == "twenty-one"


def test_plural():
    assert words.plural("car") == "cars"
    assert words.plural("moving ball") == "moving balls"
    assert words.plural("lively cat") == "lively cats"
    assert words.plural("box") == "boxes"
    assert words.plural("butterfly") == "butterflies"
    assert words.plural("person") == "people"
    assert words.plural("wolf") == "wolves"


def test_singular_noun():
    assert words.singular_noun("cars") == "car"
    assert words.singular_noun("boxes") == "box"
    assert words.singular_noun("butterflies") == "butterfly"
    assert words.singular_noun("people") == "person"
    assert words.singular_noun("car") is False


def test_article():
    assert words.a("red car") == "a red car"
    assert words.a("orange ball") == "an orange ball"
    assert words.a("apple") == "an apple"
    assert words.a("hour") == "an hour"
    assert words.a("user") == "a user"
    assert words.a("moving car") == "a moving car"
