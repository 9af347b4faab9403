"""Token/word lexicons backing the shallow labelling functions.

The reference embeds analogous factual word lists as module constants
(annotations.py:21-125, spacy_wrapper.py:13-65). These are our own
curated lists (public factual knowledge); the engine treats them as
broadcast dictionary tables.
"""

MONTHS = {
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
}
MONTHS_ABBRV = {
    "Jan.", "Feb.", "Mar.", "Apr.", "May.", "Jun.", "Jul.", "Aug.",
    "Sep.", "Sept.", "Oct.", "Nov.", "Dec.",
}
DAYS = {
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
    "Saturday", "Sunday",
}
DAYS_ABBRV = {
    "Mon.", "Tue.", "Tues.", "Wed.", "Thu.", "Thur.", "Thurs.",
    "Fri.", "Sat.", "Sun.",
}

MAGNITUDES = {
    "million", "billion", "trillion", "mln", "bln", "bn", "thousand",
    "m", "k", "b", "m.", "k.", "b.", "mln.", "bln.", "bn.",
}

UNITS = {
    "tons", "tonnes", "barrels", "m", "km", "miles", "kph", "mph",
    "kg", "ft", "gal", "gallons", "g", "kw", "s", "oz", "m2", "km2",
    "yards", "w", "kwh", "gb", "mw", "kilometers", "kilometres",
    "meters", "metres", "liters", "litres", "grams", "pounds",
    "degrees", "ton", "kilograms", "inches", "inch", "megawatts",
    "feet", "ounces", "watts", "megabytes", "gigabytes", "terabytes",
    "hectares", "centimeters", "millimeters", "acres", "seconds",
    "minutes", "hours",
}

PERCENT_WORDS = {"%", "percent", "pc.", "pc", "pct", "pct.", "percents", "percentage"}

ORDINAL_WORDS = {
    "first", "second", "third", "fourth", "fifth", "sixth", "seventh",
    "eighth", "ninth", "tenth",
}

ROMAN_NUMERALS = {
    "I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX", "X",
    "XI", "XII", "XIII", "XIV", "XV", "XVI", "XVII", "XVIII", "XIX", "XX",
}

CURRENCY_SYMBOLS = {"$", "¥", "£", "€", "kr", "₽", "R$", "₹", "Rp", "₪", "zł", "Rs", "₺"}

CURRENCY_CODES = {
    "USD", "EUR", "CNY", "JPY", "GBP", "NOK", "SEK", "DKK", "CAD",
    "RUB", "MXN", "BRL", "CHF", "INR", "IDR", "ILS", "KRW", "TRY",
    "AUD", "SGD", "NZD", "THB", "HKD", "ZAR", "PLN", "HUF", "CZK",
}

CURRENCY_WORDS = {"euros", "cents", "rubles", "dollars", "pounds", "kroner", "yen"}

NOT_NAMED_ENTITIES = {"EPS", "No", "Nb", "N'T", "n't"}

LEGAL_SUFFIXES = {
    "ltd", "llc", "ltda", "inc", "corp", "sa", "plc", "ag", "gmbh",
    "bhd", "jsc", "co", "ab", "ad", "tbk", "as", "pjsc", "spa", "nv",
    "dd", "oao", "asa", "ojsc", "lp", "llp", "oyj", "se", "kk",
    "aps", "cv", "sas", "sro", "oy", "kg", "bv", "sarl", "srl", "sl",
    "holdings", "group",
}

COUNTRIES = {
    "Afghanistan", "Albania", "Algeria", "Argentina", "Armenia",
    "Australia", "Austria", "Bangladesh", "Belarus", "Belgium",
    "Bolivia", "Brazil", "Bulgaria", "Cambodia", "Cameroon", "Canada",
    "Chile", "China", "Colombia", "Croatia", "Cuba", "Cyprus",
    "Denmark", "Ecuador", "Egypt", "Estonia", "Ethiopia", "Finland",
    "France", "Georgia", "Germany", "Ghana", "Greece", "Hungary",
    "Iceland", "India", "Indonesia", "Iran", "Iraq", "Ireland",
    "Israel", "Italy", "Jamaica", "Japan", "Jordan", "Kazakhstan",
    "Kenya", "Kuwait", "Latvia", "Lebanon", "Libya", "Lithuania",
    "Luxembourg", "Malaysia", "Mexico", "Moldova", "Monaco",
    "Mongolia", "Morocco", "Mozambique", "Myanmar", "Nepal",
    "Netherlands", "New Zealand", "Nicaragua", "Nigeria", "Norway",
    "Oman", "Pakistan", "Panama", "Paraguay", "Peru", "Philippines",
    "Poland", "Portugal", "Qatar", "Romania", "Russia", "Rwanda",
    "Saudi Arabia", "Senegal", "Serbia", "Singapore", "Slovakia",
    "Slovenia", "Somalia", "South Africa", "South Korea", "Spain",
    "Sri Lanka", "Sudan", "Sweden", "Switzerland", "Syria", "Taiwan",
    "Tanzania", "Thailand", "Tunisia", "Turkey", "Uganda", "Ukraine",
    "United Arab Emirates", "United Kingdom", "United States",
    "Uruguay", "Uzbekistan", "Venezuela", "Vietnam", "Yemen",
    "Zambia", "Zimbabwe", "USA", "UK", "Russian Federation",
}

NORPS = {
    "Afghan", "African", "Albanian", "Algerian", "American", "Arab",
    "Argentine", "Armenian", "Asian", "Australian", "Austrian",
    "Belgian", "Bolivian", "Brazilian", "British", "Buddhist",
    "Bulgarian", "Californian", "Canadian", "Catholic", "Chilean",
    "Chinese", "Christian", "Colombian", "Communist", "Conservative",
    "Croat", "Cuban", "Czech", "Dane", "Danish", "Democrat",
    "Democratic", "Dutch", "Ecuadorean", "Egyptian", "English",
    "Estonian", "Ethiopian", "European", "Filipino", "Finnish",
    "French", "German", "Greek", "Hindu", "Hispanic", "Hungarian",
    "Indian", "Indonesian", "Iranian", "Iraqi", "Irish", "Islamic",
    "Israeli", "Italian", "Jamaican", "Japanese", "Jew", "Jewish",
    "Jordanian", "Kenyan", "Korean", "Kurdish", "Kuwaiti", "Labour",
    "Latin", "Latvian", "Lebanese", "Liberal", "Libyan", "Lithuanian",
    "Londoner", "Malaysian", "Mexican", "Moroccan", "Muslim",
    "Nationalist", "Nepalese", "New Yorker", "Nigerian", "Nordic",
    "Norwegian", "Orthodox", "Pakistani", "Palestinian", "Parisian",
    "Peruvian", "Polish", "Pole", "Portuguese", "Protestant",
    "Republican", "Roman", "Romanian", "Russian", "Saudi",
    "Scandinavian", "Scottish", "Senegalese", "Serb", "Serbian",
    "Shia", "Shiite", "Sikh", "Singaporean", "Slovak", "Socialist",
    "Somali", "Soviet", "Spaniard", "Spanish", "Sudanese", "Sunni",
    "Swede", "Swedish", "Swiss", "Syrian", "Taiwanese", "Texan",
    "Thai", "Tibetan", "Tunisian", "Turk", "Turkish", "Ugandan",
    "Ukrainian", "Uruguayan", "Venezuelan", "Vietnamese", "Welsh",
    "Western", "Yemeni", "Zambian", "Zimbabwean", "Zionist",
}

FACILITIES = {
    "Palace", "Temple", "Gate", "Museum", "Bridge", "Road", "Airport",
    "Hospital", "School", "Tower", "Station", "Avenue", "Prison",
    "Building", "Plant", "Mall", "Church", "Synagogue", "Mosque",
    "Harbor", "Harbour", "Railway", "Metro", "Tram", "Highway",
    "Tunnel", "House", "Field", "Hall", "Place", "Freeway", "Wall",
    "Square", "Park", "Hotel", "Stadium", "Arena", "Library",
}

LEGAL = {
    "Law", "Agreement", "Act", "Bill", "Constitution", "Directive",
    "Treaty", "Code", "Reform", "Convention", "Resolution",
    "Regulation", "Amendment", "Customs", "Protocol", "Charter",
}

EVENTS = {
    "War", "Festival", "Show", "Massacre", "Battle", "Revolution",
    "Olympics", "Games", "Cup", "Week", "Day", "Year", "Series",
    "Summit", "Conference", "Forum",
}

LANGUAGES = {
    "Arabic", "Bengali", "Cantonese", "Catalan", "Chinese", "Czech",
    "Danish", "Dutch", "English", "Estonian", "Filipino", "Finnish",
    "French", "German", "Greek", "Hebrew", "Hindi", "Hungarian",
    "Icelandic", "Indonesian", "Italian", "Japanese", "Javanese",
    "Korean", "Latin", "Latvian", "Lithuanian", "Malay", "Mandarin",
    "Marathi", "Norwegian", "Persian", "Polish", "Portuguese",
    "Punjabi", "Romanian", "Russian", "Sanskrit", "Serbian",
    "Slovak", "Slovenian", "Spanish", "Swahili", "Swedish", "Tagalog",
    "Tamil", "Telugu", "Thai", "Turkish", "Ukrainian", "Urdu",
    "Uzbek", "Vietnamese", "Welsh", "Yiddish", "Zulu",
}

GENERIC_TOKENS = {
    "International", "Group", "Solutions", "Technologies",
    "Management", "Association", "Associates", "Partners", "Systems",
    "Holdings", "Services", "Bank", "Fund", "Company",
}

LOWERCASED_TOKENS = {"'s", "-", "a", "an", "the", "at", "by", "for", "in", "of", "on", "to", "up", "and"}

NAME_PREFIXES = {"-", "von", "van", "de", "di", "le", "la", "het", "dem", "der", "den", "d'", "ter"}

# A frequent-word list standing in for the reference's vocabulary-rank
# test (annotations.py:1274-1277, rank <= 15000 == frequent). A span is
# "infrequent" when at least one token falls outside this set.
COMMON_WORDS = {w.lower() for w in (
    LOWERCASED_TOKENS | MAGNITUDES | UNITS | ORDINAL_WORDS | {
        "i", "you", "he", "she", "it", "we", "they", "this", "that",
        "these", "those", "is", "are", "was", "were", "be", "been",
        "being", "have", "has", "had", "do", "does", "did", "will",
        "would", "can", "could", "shall", "should", "may", "might",
        "must", "not", "no", "yes", "but", "or", "if", "then", "than",
        "so", "as", "with", "from", "into", "over", "under", "about",
        "after", "before", "between", "during", "through", "against",
        "new", "old", "good", "bad", "big", "small", "high", "low",
        "last", "next", "year", "years", "day", "days", "week",
        "month", "time", "people", "man", "woman", "company", "said",
        "says", "say", "one", "two", "three", "four", "five", "also",
        "more", "most", "some", "any", "all", "other", "many", "much",
        "when", "where", "which", "who", "what", "how", "why", "while",
        "there", "here", "its", "his", "her", "their", "our", "your",
        "my", "mr", "mrs", "ms", "percent", "government", "state",
        "city", "world", "country", "market", "report", "according",
        "chief", "executive", "officer", "president", "minister",
        "bank", "group", "york", "monday", "tuesday", "wednesday",
        "thursday", "friday", "saturday", "sunday",
    }
)}

SENT_END = {".", "!", "?", ";"}
QUOTES = {"'", '"', "‘", "“", "”", "’", "`", "``"}
PUNCT = set(".,;:!?()[]{}\"'`“”‘’-–—&/%$€£¥#@*+<>=~^|\\_")
